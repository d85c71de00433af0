"""Z-order layout (operators/layout.py): the data-skipping property
measured from real parquet footers, plus the INT96-timestamp-stats
regression guard and key/edge algebra."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from car_etl_spark.operators import layout as L
from car_etl_spark.tables import load_tables
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layouts")
    ev = load_tables(spark, SF_ORACLE, ("events",))["events"]
    L.write_linear(ev, str(base / "linear"), "ts", num_files=32)
    edges = L.write_zordered(
        ev, str(base / "z"), ["ts", "user_id"], bits_per_col=6, num_files=32
    )
    mm = ev.agg(
        F.min("ts").alias("tmin"),
        F.max("ts").alias("tmax"),
        F.min("user_id").alias("umin"),
        F.max("user_id").alias("umax"),
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("chk"),
    ).collect()[0]
    return base, edges, mm


def _probes(mm):
    tspan = mm.tmax - mm.tmin
    uspan = mm.umax - mm.umin
    return {
        "ts": (mm.tmin + tspan * 0.40, mm.tmin + tspan * 0.45),
        "user_id": (mm.umin + uspan * 40 // 100, mm.umin + uspan * 45 // 100),
    }


def test_linear_layout_prunes_only_the_sort_column(spark, layouts):
    base, _edges, mm = layouts
    r = L.prune_fraction_report(spark, str(base / "linear"), _probes(mm))
    assert r["ts"] < 0.15  # a 5% time slice touches ~3/32 files
    assert r["user_id"] == 1.0  # the non-sort column cannot skip at all


def test_zorder_layout_prunes_both_columns(spark, layouts):
    base, _edges, mm = layouts
    r = L.prune_fraction_report(spark, str(base / "z"), _probes(mm))
    # both dimensions skip; each pays a bounded locality tax vs a
    # dedicated single-column sort (measured 0.31 / 0.22 at 32 files)
    assert r["ts"] < 0.5
    assert r["user_id"] < 0.5


def test_zorder_is_a_permutation(spark, layouts):
    base, _edges, mm = layouts
    got = (
        spark.read.parquet(str(base / "z"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("chk"))
        .collect()[0]
    )
    assert (got.n, got.chk) == (mm.n, mm.chk)


def test_timestamp_footer_stats_present(layouts):
    """Regression: Spark's default INT96 parquet timestamps carry NO
    min/max footer statistics — time predicates silently lose all
    skipping.  The layout writers (and the tuned session) force
    TIMESTAMP_MICROS; every file must expose ts stats."""
    base, _edges, _mm = layouts
    for path in ("linear", "z"):
        ranges = L.file_column_ranges(str(base / path), ["ts"])
        assert ranges and all("ts" in r for r in ranges)


def test_edges_reusable_for_incremental_batches(spark, layouts):
    """A later batch written with the SAME edges lands in the same
    z-space: equal values get equal keys across writes."""
    _base, edges, _mm = layouts
    ev = load_tables(spark, SF_ORACLE, ("events",))["events"].limit(500)
    k1 = ev.select(L.zorder_key(edges, 6).alias("k")).collect()
    k2 = ev.select(L.zorder_key(edges, 6).alias("k")).collect()
    assert [r.k for r in k1] == [r.k for r in k2]
    assert all(r.k >= 0 for r in k1)


def test_nulls_cluster_at_origin(spark, layouts):
    _base, edges, _mm = layouts
    df = spark.createDataFrame(
        [(None, None)], "ts timestamp, user_id long"
    )
    assert df.select(L.zorder_key(edges, 6).alias("k")).collect()[0].k == 0


def test_registry_query_reads_zordered_copy_identically(spark, layouts, tmp_path):
    """The layout is a drop-in storage stage for the production
    queries: a registry query over a z-ordered copy of the events
    table returns exactly the raw-table result (while its ts/user_id
    predicates gain footer skipping, per the fraction tests above)."""
    from car_etl_spark.queries.eventsq import events_user_running_total

    ev = load_tables(spark, SF_ORACLE, ("events",))["events"]
    L.write_zordered(
        ev, str(tmp_path / "events.parquet"), ["ts", "user_id"], bits_per_col=6, num_files=8
    )
    got = events_user_running_total(spark, str(tmp_path)).collect()
    want = events_user_running_total(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_key_validation():
    edges = {"a": [0.5], "b": [0.5]}
    with pytest.raises(ValueError):
        L.zorder_key({"a": [0.5]}, 4)  # needs >= 2 columns
    with pytest.raises(ValueError):
        L.zorder_key(edges, 32)  # 2 x 32 bits overflows the BIGINT key


def test_partitioned_zorder_layout(spark, tmp_path):
    """partition_cols combines directory pruning with within-directory
    z-clustering: tenant dirs exist, every file inside a tenant dir
    covers a contiguous z-range (disjoint doc_id spans per file for the
    synthetic monotone corpus), and the row set is a permutation."""
    n = 20_000
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), (F.col("id") % 2).cast("string")).alias("tenant_id"),
            ((F.col("id") * 37) % 1000).alias("file_size"),
        )
        # shuffle the input so clustering is the layout's doing
        .repartition(16)
    )
    path = str(tmp_path / "pz")
    L.write_zordered(
        df, path, ["doc_id", "file_size"], bits_per_col=5, num_files=16,
        partition_cols=("tenant_id",),
    )
    import os

    t0_dir = os.path.join(path, "tenant_id=t0")
    assert os.path.isdir(t0_dir) and os.path.isdir(os.path.join(path, "tenant_id=t1"))
    back = spark.read.parquet(path)
    assert back.count() == n
    assert back.agg(F.sum("doc_id")).collect()[0][0] == n * (n - 1) // 2
    # within one tenant dir: BOTH z-columns skip files under a narrow
    # probe (the Morton property, measured from real footers), which a
    # single-column or insertion-order layout cannot do
    ranges = L.file_column_ranges(t0_dir, ["doc_id", "file_size"])
    assert len(ranges) >= 4
    f_doc = L.candidate_file_fraction(ranges, "doc_id", n * 40 // 100, n * 45 // 100)
    f_size = L.candidate_file_fraction(ranges, "file_size", 400, 450)
    assert f_doc < 0.75, (f_doc, f_size)
    assert f_size < 0.75, (f_doc, f_size)
