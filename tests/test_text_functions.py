

def test_chunk_by_tokens_overlap_and_edges(spark):
    from car_etl_spark.operators.chunking import chunk_by_tokens

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # 10 tokens
            (2, "x y"),                    # shorter than one window
            (3, "   "),                    # blank: no chunks
            (4, "p  q\t r\n s t u"),      # messy whitespace normalizes
        ],
        "doc_id long, text string",
    )
    out = chunk_by_tokens(docs, max_tokens=4, overlap=2).orderBy(
        "doc_id", "chunk_index"
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_index, r.token_count, r.content))
    # stride 2: windows start at 0,2,4,6 — consecutive chunks share 2
    # tokens, and NO trailing window fully contained in its predecessor
    # (a start at 8 would re-emit "i j", already inside "g h i j")
    assert by_doc[1] == [
        (0, 4, "a b c d"), (1, 4, "c d e f"), (2, 4, "e f g h"),
        (3, 4, "g h i j"),
    ]
    assert by_doc[2] == [(0, 2, "x y")]
    assert 3 not in by_doc
    assert by_doc[4][0] == (0, 4, "p q r s")

    import pytest

    with pytest.raises(ValueError):
        chunk_by_tokens(docs, max_tokens=4, overlap=4)


def test_percentile_approx_within_budget_of_exact(spark):
    """The 100 TB path uses percentile_approx with a declared accuracy
    budget; validate it against the exact oracle-checked form at test
    scale (events_value_percentiles docstring contract)."""
    from pyspark.sql import functions as F

    from car_etl_spark.tables import load_tables
    from tests.conftest import SF_ORACLE

    ev = load_tables(spark, SF_ORACLE, ("events",))["events"]
    both = ev.groupBy("event_type").agg(
        F.percentile("value", 0.9).alias("exact"),
        F.percentile_approx("value", 0.9, 10000).alias("approx"),
        F.expr("max(value) - min(value)").alias("span"),
    )
    for r in both.collect():
        assert abs(r.approx - r.exact) <= max(0.01 * r.span, 1e-9), r


def test_approx_count_distinct_within_budget(spark):
    """The 100 TB form of segment_distinct_counts: HLL++ approx
    distincts validated against the exact oracle-checked form (rsd=2%
    -> assert within 3x the nominal error, like the percentile
    contract)."""
    from pyspark.sql import functions as F

    from car_etl_spark.tables import load_tables
    from tests.conftest import SF_ORACLE

    cust = load_tables(spark, SF_ORACLE, ("customer",))["customer"]
    both = cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("exact"),
        F.approx_count_distinct("c_nationkey", 0.02).alias("approx"),
        F.countDistinct("c_custkey").alias("exact_keys"),
        F.approx_count_distinct("c_custkey", 0.02).alias("approx_keys"),
    )
    for r in both.collect():
        assert abs(r.approx - r.exact) <= max(3 * 0.02 * r.exact, 2), r
        assert abs(r.approx_keys - r.exact_keys) <= max(3 * 0.02 * r.exact_keys, 2), r
