"""Training-mix suite: deterministic sampling + contamination screen."""

from __future__ import annotations

from pyspark.sql import functions as F

from car_etl_spark.queries import mix as X


def test_sample_hash_rate_accuracy_and_determinism(spark):
    """The multiplicative hash must be uniform enough that the sampled
    fraction tracks the configured rate, and identical across physical
    layouts (pure function of the key — re-runs keep the same subset)."""
    ids = spark.range(20_000).select(F.col("id").alias("doc_id"))
    u = X.sample_hash(F.col("doc_id"))
    for rate in (0.5, 0.25, 0.125):
        cut = int(rate * X.HASH_MOD)
        n = ids.filter(u < cut).count()
        assert abs(n / 20_000 - rate) < 0.02, (rate, n)
    a = {r.doc_id for r in ids.filter(u < X.HASH_MOD // 4).collect()}
    b = {
        r.doc_id
        for r in ids.repartition(3, "doc_id").filter(u < X.HASH_MOD // 4).collect()
    }
    assert a == b  # layout-independent: same subset every run


def test_contamination_flags_planted_copy_only(spark):
    """A doc embedding a benchmark doc's text verbatim is flagged; an
    unrelated doc is not; the benchmark doc itself is not counted."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (29, bench_text, "en", "src0", len(bench_text)),  # benchmark (29 % 29 == 0)
            (30, "intro words then " + bench_text + " trailing tail", "en", "src1", 1),
            (31, "one two three four five six seven eight nine ten", "en", "src1", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    grams = X._doc_grams(docs)
    bench = grams.filter(F.col("doc_id") % X.BENCHMARK_MOD == 0).select("gram").distinct()
    flagged = {
        r.doc_id
        for r in grams.filter(F.col("doc_id") % X.BENCHMARK_MOD != 0)
        .join(bench, "gram")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert flagged == {30}


def test_doc_grams_skips_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "too few words here", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert X._doc_grams(docs).count() == 0


def _tenant_docs(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), (F.col("id") % 2).cast("string")).alias("tenant_id"),
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("source"),
        F.concat(F.lit("doc body "), F.col("id").cast("string")).alias("text"),
    )


def test_stratified_sample_per_tenant_rates_and_isolation(spark):
    """Per-(tenant, source) rates are honored, decisions are
    deterministic, and tenant A's subset is a pure function of A's own
    rows + rates — re-rating or removing tenant B changes nothing."""
    docs = _tenant_docs(spark)
    rates = {
        ("t0", "src0"): 1.0, ("t0", "src1"): 0.25, ("t0", "src2"): 0.0,
        ("t1", "src0"): 0.5, ("t1", "src1"): 0.5, ("t1", "src2"): 0.5,
    }
    out = X.stratified_sample(docs, rates, tenant_col="tenant_id")
    got = {
        (r.tenant_id, r.source): r.n
        for r in out.groupBy("tenant_id", "source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # rate 1.0 keeps everything, 0.0 keeps nothing, fractions approximate
    assert got[("t0", "src0")] == docs.filter(
        (F.col("tenant_id") == "t0") & (F.col("source") == "src0")
    ).count()
    assert ("t0", "src2") not in got
    n01 = docs.filter((F.col("tenant_id") == "t0") & (F.col("source") == "src1")).count()
    assert 0.15 * n01 < got[("t0", "src1")] < 0.35 * n01
    # isolation: drop tenant t1 and re-rate it wildly — t0 subset identical
    only0 = docs.filter(F.col("tenant_id") == "t0")
    rates2 = {**rates, ("t1", "src0"): 0.001}
    a = sorted(r.doc_id for r in out.filter(F.col("tenant_id") == "t0").collect())
    b = sorted(r.doc_id for r in X.stratified_sample(only0, rates2, tenant_col="tenant_id").collect())
    assert a == b
    # tenant-blind form still works with source-keyed rates
    blind = X.stratified_sample(docs, {"src0": 1.0, "src1": 0.0, "src2": 0.0})
    assert blind.count() == docs.filter(F.col("source") == "src0").count()


def test_contamination_screen_tenant_scoped(spark):
    """Screening is per tenant: requires tenant= on a tenant-scoped
    corpus, flags only that tenant's docs, and never reads the other
    tenant's rows (the flagged set from a physically-isolated slice is
    identical)."""
    import pytest

    base = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    rows = [
        (1, "t0", "src0", base + " tail one"),        # contaminated, t0
        (2, "t0", "src0", "clean words only here no overlap at all"),
        (3, "t1", "src1", base + " tail two"),        # contaminated, t1
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, tenant_id string, source string, text string")
    bench = spark.createDataFrame([(100, base + " suffix")], "doc_id long, text string")
    with pytest.raises(ValueError, match="requires tenant="):
        X.contamination_screen(corpus, bench, tenant_col="tenant_id")
    t0 = X.contamination_screen(corpus, bench, tenant_col="tenant_id", tenant="t0")
    assert [(r.doc_id, r.tenant_id) for r in t0.collect()] == [(1, "t0")]
    # physically isolated slice -> identical result (nothing leaked in)
    iso = X.contamination_screen(
        corpus.filter(F.col("tenant_id") == "t0"), bench,
        tenant_col="tenant_id", tenant="t0",
    )
    assert sorted(map(tuple, iso.collect())) == sorted(map(tuple, t0.collect()))


def test_stratified_sample_fail_closed_for_negative_keys(spark):
    """Spark's % preserves sign; a negative key must not produce a
    negative u that slips past `u < cut` at rate 0.0 (pmod fix).  Also:
    negative keys at rate 1.0 are all kept, and non-negative keys'
    membership is unchanged by the pmod form (pmod == % for them)."""
    docs = spark.range(-2000, 0).select(
        F.col("id").alias("doc_id"),
        F.lit("src0").alias("source"),
    )
    assert X.stratified_sample(docs, {"src0": 0.0}).count() == 0
    assert X.stratified_sample(docs, {}, default_rate=0.0).count() == 0
    assert X.stratified_sample(docs, {"src0": 1.0}).count() == 2000
    half = X.stratified_sample(docs, {"src0": 0.5}).count()
    assert 0.35 * 2000 < half < 0.65 * 2000
    # tenant form: same fail-closed contract
    t = docs.withColumn("tenant_id", F.lit("t0"))
    assert X.stratified_sample(t, {("t0", "src0"): 0.0}, tenant_col="tenant_id").count() == 0
    assert X.stratified_sample(t, {("t0", "src0"): 1.0}, tenant_col="tenant_id").count() == 2000
