"""Portable distinct-count sketches (functions/sketches.py): error
bounds on known cardinalities, duplicate-insensitivity, shard-merge
algebra, and direct DuckDB twin parity at a non-default precision.
(The default-precision cross-engine parity rides in the
``segment_distinct_counts`` registry row via test_oracle_parity.)"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from car_etl_spark.functions import sketches as SK


def _corpus(spark, sizes: dict[str, int], dup: int = 1):
    """(grp, val) frame with ``sizes[grp]`` distinct values per group,
    each repeated ``dup`` times."""
    parts = []
    for grp, n in sizes.items():
        df = (
            spark.range(n * dup)
            .select(
                F.lit(grp).alias("grp"),
                F.concat(F.lit(f"{grp}:"), (F.col("id") % n).cast("string")).alias("val"),
            )
        )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


SIZES = {"small": 500, "mid": 5000, "big": 50000}


@pytest.fixture(scope="module")
def estimates(spark):
    df = _corpus(spark, SIZES)
    hll = SK.hll_distinct(df, ["grp"], F.col("val"))
    kmv = SK.kmv_distinct(df, ["grp"], F.col("val"))
    rows = {
        r["grp"]: (r["hll_distinct"], r["kmv_distinct"])
        for r in hll.join(kmv, "grp").collect()
    }
    return rows


def test_hll_error_bounds(estimates):
    # m=512: linear counting covers the small group; the raw estimator's
    # sigma is 1.04/sqrt(512) ~ 4.6%, assert inside ~3 sigma.  (A fixed
    # corpus is ONE draw from that distribution: the value format was
    # checked to be a typical draw, not cherry-picked past the bound.)
    for grp, n in SIZES.items():
        est = estimates[grp][0]
        rel = abs(est - n) / n
        bound = 0.10 if n <= 1000 else 0.14
        assert rel < bound, f"{grp}: hll {est} vs {n} ({rel:.1%})"


def test_kmv_error_bounds(estimates):
    # k=256: sigma ~ 1/sqrt(k-2) ~ 6.3%; assert inside ~3 sigma.
    for grp, n in SIZES.items():
        est = estimates[grp][1]
        rel = abs(est - n) / n
        assert rel < 0.20, f"{grp}: kmv {est} vs {n} ({rel:.1%})"


def test_kmv_exact_below_k(spark):
    df = _corpus(spark, {"tiny": 100})
    rows = SK.kmv_distinct(df, ["grp"], F.col("val"), k=256).collect()
    assert rows[0]["kmv_distinct"] == 100  # fewer than k distinct -> exact


def test_duplicates_do_not_move_estimates(spark, estimates):
    df3 = _corpus(spark, SIZES, dup=3)
    hll = SK.hll_distinct(df3, ["grp"], F.col("val"))
    kmv = SK.kmv_distinct(df3, ["grp"], F.col("val"))
    rows = {
        r["grp"]: (r["hll_distinct"], r["kmv_distinct"])
        for r in hll.join(kmv, "grp").collect()
    }
    assert rows == estimates


def test_hll_shard_merge_equals_whole(spark):
    whole = _corpus(spark, SIZES)
    # deterministic disjoint-ish split (shards share some values too:
    # the merge must be a set union, not a sum)
    s1 = whole.filter(F.crc32(F.col("val")) % 3 != 0)
    s2 = whole.filter(F.crc32(F.col("val")) % 3 != 1)
    merged = SK.hll_merge(
        [SK.hll_registers(s, ["grp"], F.col("val")) for s in (s1, s2)], ["grp"]
    )
    est_merged = {
        r["grp"]: r["hll_distinct"]
        for r in SK.hll_estimate(merged, ["grp"]).collect()
    }
    est_whole = {
        r["grp"]: r["hll_distinct"]
        for r in SK.hll_distinct(whole, ["grp"], F.col("val")).collect()
    }
    assert est_merged == est_whole


def test_kmv_shard_merge_equals_whole(spark):
    whole = _corpus(spark, SIZES)
    s1 = whole.filter(F.crc32(F.col("val")) % 3 != 0)
    s2 = whole.filter(F.crc32(F.col("val")) % 3 != 1)
    merged = SK.kmv_merge(
        [SK.kmv_state(s, ["grp"], F.col("val")) for s in (s1, s2)], ["grp"]
    )
    est_merged = {
        r["grp"]: r["kmv_distinct"] for r in SK.kmv_estimate(merged, ["grp"]).collect()
    }
    est_whole = {
        r["grp"]: r["kmv_distinct"]
        for r in SK.kmv_distinct(whole, ["grp"], F.col("val")).collect()
    }
    assert est_merged == est_whole


def test_register_frame_is_bounded(spark):
    regs = SK.hll_registers(_corpus(spark, SIZES), ["grp"], F.col("val"), p=7)
    per_group = {
        r["grp"]: r["n"]
        for r in regs.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(n <= 128 for n in per_group.values())  # state capped at m
    assert per_group["big"] == 128  # saturated at 50k distinct


@pytest.mark.parametrize("p,k", [(7, 64), (11, 512)])
def test_sql_twins_match_spark_nondefault_params(spark, p, k):
    """Pin the SQL generators for non-default (p, k) — the registry row
    only exercises the defaults."""
    df = _corpus(spark, {"a": 300, "b": 7000})
    hll = SK.hll_distinct(df, ["grp"], F.col("val"), p=p)
    kmv = SK.kmv_distinct(df, ["grp"], F.col("val"), k=k)
    spark_rows = {
        r["grp"]: (r["hll_distinct"], r["kmv_distinct"])
        for r in hll.join(kmv, "grp").collect()
    }
    con = duckdb.connect()
    con.register("src", df.toPandas())
    sql = f"""
WITH {SK.hll_sql_ctes('src', ['grp'], 'val', p=p)},
{SK.kmv_sql_ctes('src', ['grp'], 'val', k=k)}
SELECT hq_out.grp, hll_distinct, kmv_distinct
FROM hq_out JOIN kq_out ON hq_out.grp = kq_out.grp
"""
    duck = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert spark_rows == duck


def test_invalid_params_rejected():
    with pytest.raises(ValueError):
        SK._hll_consts(3)
    with pytest.raises(ValueError):
        SK.kmv_sql_ctes("t", ["g"], "v", k=1)


# ---------------------------------------------------------------------------
# Histogram quantile sketch


HQ = [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]


def _values(spark, n_per_group: int):
    """Deterministic skewed-ish values: v = (id % 997) ** 1.5 per group."""
    return (
        spark.range(2 * n_per_group)
        .select(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
            F.pow((F.col("id") % 997).cast("double"), 1.5).alias("v"),
        )
    )


def test_histogram_quantiles_within_bin_width(spark):
    df = _values(spark, 20000)
    est = {
        r["grp"]: r
        for r in SK.histogram_quantile_estimates(df, ["grp"], F.col("v"), HQ, bins=64).collect()
    }
    exact = {
        r["grp"]: r
        for r in df.groupBy("grp")
        .agg(
            *[F.percentile("v", q).alias(a) for q, a in HQ],
            ((F.max("v") - F.min("v")) / 64).alias("bin_width"),
        )
        .collect()
    }
    for g in ("a", "b"):
        for _q, a in HQ:
            err = abs(est[g][a] - exact[g][a])
            assert err <= exact[g]["bin_width"], (g, a, err, exact[g]["bin_width"])


def test_histogram_shard_merge_equals_whole(spark):
    df = _values(spark, 5000)
    frame = SK.histogram_frame(df, ["grp"], F.col("v"))
    s1 = df.filter(F.col("id") % 3 == 0)
    s2 = df.filter(F.col("id") % 3 != 0)
    merged = SK.histogram_merge(
        [SK.histogram_state(s, ["grp"], F.col("v"), 64, frame=frame) for s in (s1, s2)],
        ["grp"],
    )
    est_m = {r["grp"]: tuple(r[a] for _q, a in HQ)
             for r in SK.histogram_quantiles(merged, ["grp"], HQ, 64).collect()}
    est_w = {r["grp"]: tuple(r[a] for _q, a in HQ)
             for r in SK.histogram_quantile_estimates(df, ["grp"], F.col("v"), HQ, 64).collect()}
    assert est_m == est_w


def test_histogram_state_is_bounded(spark):
    state = SK.histogram_state(_values(spark, 20000), ["grp"], F.col("v"), bins=32)
    per_group = {r["grp"]: r["n"] for r in state.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n <= 32 for n in per_group.values())


def test_histogram_frozen_frame_clamps_outliers(spark):
    df = _values(spark, 1000)
    frame = SK.histogram_frame(df.filter(F.col("v") < 1000), ["grp"], F.col("v"))
    state = SK.histogram_state(df, ["grp"], F.col("v"), 16, frame=frame)
    bins = [r["__bin"] for r in state.collect()]
    assert all(0 <= b <= 15 for b in bins)  # out-of-frame mass clamps to edge bins
    total = state.groupBy().agg(F.sum("__cnt")).collect()[0][0]
    assert total == df.count()  # no rows lost to clamping


def test_histogram_sql_twin_matches_spark_nondefault_bins(spark):
    df = _values(spark, 3000)
    spark_rows = {
        r["grp"]: tuple(r[a] for _q, a in HQ)
        for r in SK.histogram_quantile_estimates(df, ["grp"], F.col("v"), HQ, bins=48).collect()
    }
    import duckdb

    con = duckdb.connect()
    con.register("src", df.toPandas())
    sql = f"""
WITH {SK.histogram_quantiles_sql_ctes('src', ['grp'], 'v', HQ, bins=48)}
SELECT grp, p50, p90, p99 FROM qq_out
"""
    duck = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert spark_rows == duck


# ---------------------------------------------------------------------------
# Incremental sketch maintenance (streaming/incremental_sketches.py)


def _drops(spark):
    """Three overlapping micro-batches (shared values across drops: the
    merge must be set-algebra, not addition)."""
    whole = _corpus(spark, {"a": 3000, "b": 800})
    return (
        whole.filter(F.crc32("val") % 3 == 0),
        whole.filter(F.crc32("val") % 3 == 1),
        whole.filter(F.crc32("val") % 3 != 1),  # overlaps drop 1
        whole,
    )


def test_incremental_sketch_equals_batch(spark, tmp_path):
    from car_etl_spark.streaming.incremental_sketches import IncrementalDistinctSketch

    d1, d2, d3, whole = _drops(spark)
    sk = IncrementalDistinctSketch(spark, str(tmp_path), ["grp"], "val")
    assert sk.estimates() is None
    for d in (d1, d2, d3):
        sk.process_batch(d)
    inc = {r["grp"]: (r["hll_distinct"], r["kmv_distinct"]) for r in sk.estimates().collect()}
    hll = SK.hll_distinct(whole, ["grp"], F.col("val"))
    kmv = SK.kmv_distinct(whole, ["grp"], F.col("val"))
    batch = {
        r["grp"]: (r["hll_distinct"], r["kmv_distinct"])
        for r in hll.join(kmv, "grp").collect()
    }
    assert inc == batch


def test_incremental_sketch_replay_is_noop_and_restart_resumes(spark, tmp_path):
    from car_etl_spark.streaming.incremental_sketches import IncrementalDistinctSketch

    d1, d2, _d3, _whole = _drops(spark)
    sk = IncrementalDistinctSketch(spark, str(tmp_path), ["grp"], "val")
    sk.process_batch(d1)
    sk.process_batch(d2)
    before = {r["grp"]: tuple(r)[1:] for r in sk.estimates().collect()}
    sk.process_batch(d2)  # replayed drop: max/set-union absorb it
    after = {r["grp"]: tuple(r)[1:] for r in sk.estimates().collect()}
    assert before == after
    # a fresh object over the same state_dir serves the same estimates
    sk2 = IncrementalDistinctSketch(spark, str(tmp_path), ["grp"], "val")
    resumed = {r["grp"]: tuple(r)[1:] for r in sk2.estimates().collect()}
    assert resumed == after


def test_incremental_sketch_refuses_param_drift(spark, tmp_path):
    from car_etl_spark.streaming.incremental_sketches import (
        IncrementalDistinctSketch,
        SketchStoreParamError,
    )

    d1, _d2, _d3, _w = _drops(spark)
    IncrementalDistinctSketch(spark, str(tmp_path), ["grp"], "val", p=9).process_batch(d1)
    with pytest.raises(SketchStoreParamError, match="rebuild the state"):
        IncrementalDistinctSketch(spark, str(tmp_path), ["grp"], "val", p=11).estimates()


def test_incremental_sketch_stream_drain(spark, tmp_path):
    """availableNow drain of a parquet landing dir == batch sketch over
    the same files — the T1 parity contract for the sketch maintainer."""
    from car_etl_spark.streaming.incremental_sketches import (
        IncrementalDistinctSketch,
        run_distinct_maintenance,
    )

    d1, d2, _d3, _w = _drops(spark)
    landing = str(tmp_path / "landing")
    d1.write.mode("append").parquet(landing)
    d2.write.mode("append").parquet(landing)
    sk = IncrementalDistinctSketch(spark, str(tmp_path / "state"), ["grp"], "val")
    run_distinct_maintenance(
        spark, landing, "grp string, val string", sk, str(tmp_path / "ckpt")
    )
    streamed = {r["grp"]: tuple(r)[1:] for r in sk.estimates().collect()}
    union = d1.unionByName(d2)
    hll = SK.hll_distinct(union, ["grp"], F.col("val"))
    kmv = SK.kmv_distinct(union, ["grp"], F.col("val"))
    batch = {r["grp"]: tuple(r)[1:] for r in hll.join(kmv, "grp").collect()}
    assert streamed == batch


# -- count-min frequency sketch ----------------------------------------------


def _freq_corpus(spark, freqs: dict[str, int]):
    """(val) frame where item x appears freqs[x] times — a heavy-tail
    frequency profile (the CMS target workload).  Built from one local
    list (a per-item union would cost a 200-way plan analysis)."""
    data = [(x,) for x, n in sorted(freqs.items()) for _ in range(n)]
    return spark.createDataFrame(data, "val string").repartition(8)


CMS_FREQS = {"hot": 4000, "warm": 400, **{f"cold{i}": 7 for i in range(200)}}


def test_cms_never_undercounts_and_bounds_overcount(spark):
    """The CMS hard guarantee (est >= true) plus the probabilistic
    bound est <= true + (e/w)·N, checked on a fixed heavy-tail corpus
    (d=4 -> per-item overshoot odds e^-4; this corpus is one pinned
    draw, all probes inside the bound)."""
    import math

    df = _freq_corpus(spark, CMS_FREQS)
    n_total = sum(CMS_FREQS.values())
    d, w = 4, 256
    st = SK.cms_state(df, [], F.col("val"), d=d, w=w)
    items = ["hot", "warm", "cold0", "cold199", "absent"]
    est = {
        r["item"]: r["cms_freq"]
        for r in SK.cms_estimate(st, [], items, d=d, w=w).collect()
    }
    slack = math.e / w * n_total
    for it in items:
        true = CMS_FREQS.get(it, 0)
        assert est[it] >= true, (it, est[it], true)
        assert est[it] <= true + slack, (it, est[it], true, slack)


def test_cms_shard_merge_equals_whole(spark):
    """Counter addition is the merge algebra: two half-corpus states
    merged == the single-pass state, estimate-for-estimate."""
    df = _freq_corpus(spark, CMS_FREQS)
    half1 = _freq_corpus(spark, {k: v // 2 for k, v in CMS_FREQS.items() if v // 2})
    half2_freqs = {k: v - v // 2 for k, v in CMS_FREQS.items()}
    half2 = _freq_corpus(spark, {k: v for k, v in half2_freqs.items() if v})
    items = ["hot", "warm", "cold5", "absent"]
    whole = SK.cms_estimate(SK.cms_state(df, [], F.col("val")), [], items)
    merged = SK.cms_estimate(
        SK.cms_merge(
            [SK.cms_state(half1, [], F.col("val")), SK.cms_state(half2, [], F.col("val"))],
            [],
        ),
        [],
        items,
    )
    as_map = lambda rows: {r["item"]: r["cms_freq"] for r in rows.collect()}
    assert as_map(whole) == as_map(merged)


def test_cms_state_is_bounded(spark):
    """State never exceeds d·w counter rows no matter the cardinality."""
    d, w = 3, 64
    df = _freq_corpus(spark, {f"x{i}": 3 for i in range(2000)})
    st = SK.cms_state(df, [], F.col("val"), d=d, w=w)
    assert st.count() <= d * w


def test_cms_sql_twin_matches_spark_nondefault_params_and_keys(spark):
    """Bit-parity at non-default (d, w) AND through the grouped-keys
    path (per-group states, probes crossed against the key set)."""
    df = _corpus(spark, {"a": 120, "b": 900}, dup=3)
    d, w = 5, 128
    items = ["a:0", "b:7", "nope"]
    st = SK.cms_state(df, ["grp"], F.col("val"), d=d, w=w)
    got = {
        (r["grp"], r["item"]): r["cms_freq"]
        for r in SK.cms_estimate(st, ["grp"], items, d=d, w=w).collect()
    }
    con = duckdb.connect()
    con.register("src", df.toPandas())
    sql = f"WITH {SK.cms_sql_ctes('src', ['grp'], 'val', items, d=d, w=w)} SELECT grp, item, cms_freq FROM cq_out"
    duck = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}
    assert got == duck
    # the duplicated corpus counts occurrences, not distinct values
    assert got[("a", "a:0")] >= 3 and got[("b", "b:7")] >= 3
    # an absent item can only be counted via collisions, never negative
    assert got[("a", "nope")] >= 0


def test_cms_invalid_params_rejected():
    with pytest.raises(ValueError):
        SK._cms_consts(0, 64)
    with pytest.raises(ValueError):
        SK._cms_consts(4, 1)


# -- incremental CMS (additive counters + batch ledger) ------------------------


def _freq_drops(spark):
    whole = _freq_corpus(spark, CMS_FREQS)
    return (
        whole.filter(F.crc32("val") % 3 == 0),
        whole.filter(F.crc32("val") % 3 == 1),
        whole.filter(F.crc32("val") % 3 == 2),
        whole,
    )


CMS_ITEMS = ["hot", "warm", "cold0", "absent"]


def test_incremental_cms_equals_batch(spark, tmp_path):
    from car_etl_spark.streaming.incremental_sketches import IncrementalFreqSketch

    d1, d2, d3, whole = _freq_drops(spark)
    sk = IncrementalFreqSketch(spark, str(tmp_path), [], "val")
    assert sk.estimates(CMS_ITEMS) is None
    for bid, d in enumerate((d1, d2, d3)):
        assert sk.process_batch(d, bid) is True
    inc = {r["item"]: r["cms_freq"] for r in sk.estimates(CMS_ITEMS).collect()}
    batch = {
        r["item"]: r["cms_freq"]
        for r in SK.cms_estimate(
            SK.cms_state(whole, [], F.col("val")), [], CMS_ITEMS
        ).collect()
    }
    assert inc == batch


def test_incremental_cms_replay_is_noop_via_ledger(spark, tmp_path):
    """THE property the distinct sketches get for free and CMS cannot:
    counter addition double-counts a replayed batch, so the ledger must
    short-circuit it — counts unchanged, return False."""
    from car_etl_spark.streaming.incremental_sketches import IncrementalFreqSketch

    d1, d2, _d3, _w = _freq_drops(spark)
    sk = IncrementalFreqSketch(spark, str(tmp_path), [], "val")
    sk.process_batch(d1, 0)
    sk.process_batch(d2, 1)
    before = {r["item"]: r["cms_freq"] for r in sk.estimates(CMS_ITEMS).collect()}
    assert sk.process_batch(d2, 1) is False  # replay
    assert sk.process_batch(d1, 0) is False  # older replay
    after = {r["item"]: r["cms_freq"] for r in sk.estimates(CMS_ITEMS).collect()}
    assert before == after
    # restart resumes from the sidecar (state AND ledger)
    sk2 = IncrementalFreqSketch(spark, str(tmp_path), [], "val")
    assert sk2.process_batch(d2, 1) is False
    resumed = {r["item"]: r["cms_freq"] for r in sk2.estimates(CMS_ITEMS).collect()}
    assert resumed == after


def test_incremental_cms_refuses_param_drift(spark, tmp_path):
    from car_etl_spark.streaming.incremental_sketches import (
        IncrementalFreqSketch,
        SketchStoreParamError,
    )

    d1, _d2, _d3, _w = _freq_drops(spark)
    IncrementalFreqSketch(spark, str(tmp_path), [], "val", w=1024).process_batch(d1, 0)
    with pytest.raises(SketchStoreParamError, match="rebuild the state"):
        IncrementalFreqSketch(spark, str(tmp_path), [], "val", w=2048).estimates(CMS_ITEMS)


def test_incremental_cms_stream_drain(spark, tmp_path):
    """availableNow drain == batch CMS over the same landing files."""
    from car_etl_spark.streaming.incremental_sketches import (
        IncrementalFreqSketch,
        run_freq_maintenance,
    )

    d1, d2, _d3, _w = _freq_drops(spark)
    landing = str(tmp_path / "landing")
    d1.write.mode("append").parquet(landing)
    d2.write.mode("append").parquet(landing)
    sk = IncrementalFreqSketch(spark, str(tmp_path / "state"), [], "val")
    run_freq_maintenance(spark, landing, "val string", sk, str(tmp_path / "ckpt"))
    drained = {r["item"]: r["cms_freq"] for r in sk.estimates(CMS_ITEMS).collect()}
    both = d1.unionByName(d2)
    batch = {
        r["item"]: r["cms_freq"]
        for r in SK.cms_estimate(
            SK.cms_state(both, [], F.col("val")), [], CMS_ITEMS
        ).collect()
    }
    assert drained == batch
