"""Tests for entity-resolution completion (F12 exact / F31 newer-wins /
O6 rerank slice) and the F17/F19 text helpers."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from car_etl_spark.functions import text as T
from car_etl_spark.operators import resolution as R


def test_sequence_matcher_exact_parity(spark):
    from difflib import SequenceMatcher

    pairs = [
        ("acme properties", "acme property"),
        ("abc", "abc"),
        ("", ""),
        ("abc", ""),
        ("big deal holdings", "deal big holdings"),
    ]
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = [
        r.s
        for r in df.select(
            R.sequence_matcher_ratio(F.struct("a", "b")).alias("s")
        ).collect()
    ]
    for (a, b), g in zip(pairs, got):
        expected = (
            1.0 if not a and not b else 0.0 if not a or not b else SequenceMatcher(None, a, b).ratio()
        )
        assert abs(g - expected) < 1e-12, (a, b)


def test_newer_wins_merge(spark):
    t1 = datetime.datetime(2024, 1, 1)
    t2 = datetime.datetime(2024, 6, 1)
    canonical = spark.createDataFrame(
        [(1, {"address": "old addr", "phone": "111"}, t1)],
        ["entity_id", "attributes", "updated_at"],
    )
    duplicate = spark.createDataFrame(
        [(1, {"address": "new addr", "fax": "999"}, t2)],
        ["entity_id", "attributes", "updated_at"],
    )
    [row] = R.newer_wins_merge(canonical, duplicate).collect()
    # duplicate is newer -> its conflicting value wins; non-conflicting
    # keys union from both sides
    assert row.attributes == {"address": "new addr", "phone": "111", "fax": "999"}

    # canonical newer -> canonical values win
    canonical2 = canonical.withColumn("updated_at", F.lit(t2).cast("timestamp"))
    duplicate2 = duplicate.withColumn("updated_at", F.lit(t1).cast("timestamp"))
    [row2] = R.newer_wins_merge(canonical2, duplicate2).collect()
    assert row2.attributes["address"] == "old addr"
    assert row2.attributes["fax"] == "999"


def test_rerank_top_slice_passthrough_tail(spark):
    from car_etl_spark.functions.udfs import rerank_score

    docs = spark.createDataFrame(
        [(i, f"doc text {i}", float(100 - i)) for i in range(30)],
        ["doc_id", "text", "score"],
    )
    out = R.rerank_top_slice(docs, rerank_score, top_k=20)
    rows = out.orderBy("final_rank").collect()
    assert len(rows) == 30
    # head: 20 reranked rows first (all with rerank_score), tail keeps
    # base order and null rerank scores
    assert all(r.rerank_score is not None for r in rows[:20])
    assert all(r.rerank_score is None for r in rows[20:])
    assert [r.doc_id for r in rows[20:]] == list(range(20, 30))
    # reranked head is ordered by the model score
    head_scores = [r.rerank_score for r in rows[:20]]
    assert head_scores == sorted(head_scores, reverse=True)


def test_snippet_truncation(spark):
    df = spark.createDataFrame(
        [("short text",), ("word " * 60,)], ["t"]
    )
    rows = df.select(T.snippet(F.col("t"), 50).alias("s")).collect()
    assert rows[0].s == "short text"
    assert rows[1].s.endswith("...")
    assert len(rows[1].s) <= 54
    assert not rows[1].s[:-3].endswith(" ")  # cut at word boundary


def test_highlight_marks_terms(spark):
    df = spark.createDataFrame([("The Spark engine sparks joy",)], ["t"])
    [row] = df.select(T.highlight(F.col("t"), ["spark"]).alias("h")).collect()
    assert "<mark>Spark</mark>" in row.h
    # word boundary: the substring-match 'sparks' must NOT be wrapped
    assert "<mark>sparks</mark>" not in row.h and "<mark>spark</mark>s" not in row.h
    assert row.h == "The <mark>Spark</mark> engine sparks joy"


def test_highlight_escapes_regex_metacharacters(spark):
    df = spark.createDataFrame([("we love c++ and a.b here",)], ["t"])
    [row] = df.select(T.highlight(F.col("t"), ["a.b"]).alias("h")).collect()
    assert "<mark>a.b</mark>" in row.h
    # the dot must be literal: 'and' (which matches /a.b/? no — 'a.b'
    # unescaped would match 'a' + any + 'b') must not be marked
    assert "<mark>and</mark>" not in row.h
    # a term that is invalid regex unescaped must not break the whole call
    [row2] = df.select(T.highlight(F.col("t"), ["c++", "love"]).alias("h")).collect()
    assert "<mark>love</mark>" in row2.h
    # non-word-edged terms need lookaround boundaries: \b between '+'
    # and space never matches, so a bare-\b pattern silently missed this
    assert "<mark>c++</mark>" in row2.h
    # ...but still bounded: 'c' inside another word must not match
    df3 = spark.createDataFrame([("abc++x and c++ here",)], ["t"])
    [row3] = df3.select(T.highlight(F.col("t"), ["c++"]).alias("h")).collect()
    assert "<mark>c++</mark> here" in row3.h
    assert "ab<mark>" not in row3.h  # 'abc++' left alone: 'c' is mid-word


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the quick brown fox jumps",),
            ("der schnelle braune Fuchs läuft über die Straße",),
            ("le renard brun et rapide à côté de la forêt",),
            ("el zorro marrón rápido corrió según la señal",),
            ("这是一个中文句子用于测试语言识别",),
        ],
        ["t"],
    )
    got = [r.l for r in df.select(T.lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "es", "zh"]


# ---------------------------------------------------------------------------
# Round-4: LSH recall extension for the entity similarity join


def _planted_customers(spark):
    """Corporate names whose duplicate twins carry edits inside BOTH
    affix regions — one edit in the middle (breaks the all-but-last-2
    prefix key) and one inside the last 6 chars (breaks the fixed-tail
    key) — so exact affix blocking PROVABLY cannot pair them, while
    char-shingle similarity stays high."""
    base = [
        (1, "BUILDING", "acme holdings international corporation", 100.0),
        (2, "BUILDING", "acme holdngs international corporaton", 100.0),   # twin of 1
        (3, "MACHINERY", "pacific northwest property management", 200.0),
        (4, "MACHINERY", "pacific nrthwest property managment", 200.0),    # twin of 3
        (5, "BUILDING", "completely unrelated enterprises", 300.0),
        (6, "MACHINERY", "zenith industrial logistics partners", 400.0),
    ]
    return spark.createDataFrame(
        base, "c_custkey long, c_mktsegment string, c_name string, c_acctbal double"
    )


def test_affix_blocking_misses_double_affix_edits(spark):
    from car_etl_spark.queries.entity import affix_pairs, canonical_frame

    canon = canonical_frame(_planted_customers(spark))
    pairs = {(r.ka, r.kb) for r in affix_pairs(canon).collect()}
    assert (1, 2) not in pairs and (3, 4) not in pairs, (
        "planted twins no longer escape the affix keys — "
        "update the planted edits to keep this a real recall test"
    )


def test_lsh_union_recovers_planted_twins(spark):
    from car_etl_spark.queries.entity import (
        canonical_frame,
        lsh_name_pairs,
        scored_pairs,
    )

    canon = canonical_frame(_planted_customers(spark))
    got = scored_pairs(lsh_name_pairs(canon)).collect()
    by_pair = {(r.ka, r.kb): r for r in got}
    assert (1, 2) in by_pair and (3, 4) in by_pair, f"LSH missed planted twins: {sorted(by_pair)}"
    # the F12/F13 scoring puts the twins in a merge bucket, not 'different'
    for k in [(1, 2), (3, 4)]:
        assert by_pair[k].decision in ("auto_merge", "suggest_merge"), by_pair[k]
    # precision guard: unrelated same-segment names never reach a merge bucket
    for r in got:
        if (r.ka, r.kb) not in [(1, 2), (3, 4)]:
            assert r.decision == "different", r


def test_extended_rollup_is_superset_of_affix_rollup(spark, tmp_path):
    """The union can only add pairs: per-(segment, decision) counts of
    the extended query dominate the affix-only query on the real
    corpus."""
    from car_etl_spark.queries.entity import entity_match_blocked, entity_match_lsh_extended
    from tests.conftest import SF_SMALL

    affix = {
        (r.segment, r.decision): r.pair_count
        for r in entity_match_blocked(spark, SF_SMALL).collect()
    }
    ext = {
        (r.segment, r.decision): r.pair_count
        for r in entity_match_lsh_extended(spark, SF_SMALL).collect()
    }
    for key, n in affix.items():
        assert ext.get(key, 0) >= n, f"{key}: extended {ext.get(key)} < affix {n}"
