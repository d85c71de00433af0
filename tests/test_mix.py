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
