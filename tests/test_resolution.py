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
