"""Span-level exact substring dedup (Lee et al. 2021, fixed-width
window form) — planted-span semantics + engine parity for the
standalone report.

Reference behavior: the reference dedups at document grain only
(content-hash, ``020_documents.sql:31``); span-level dedup is the
standard training-data extension (repeated >= K-token spans across or
within documents), per the public Lee et al. 2021 operator.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from car_etl_spark.queries.textops import (
    SPAN_GROUP_SQL,
    SPAN_K,
    _span_group_metrics,
    span_dedup_report,
)
from tests.conftest import SF_SMALL

#: two disjoint 8-token spans (no shared window with each other or the
#: unique filler vocabularies)
S1 = "alpha bravo charlie delta echo foxtrot golf hotel"
S2 = "kilo lima mike november oscar papa quebec romeo"


@pytest.fixture(scope="module")
def planted(spark):
    assert SPAN_K == 8, "planted texts are built for K=8"
    return spark.createDataFrame(
        [
            # cross-document repeat: d1/d2 share exactly the S1 window
            Row(doc_id=1, source="A", lang="en", text="u1 u2 u3 u4 u5 u6 u7 u8 " + S1),
            Row(doc_id=2, source="A", lang="en", text=S1 + " v1 v2 v3 v4 v5 v6 v7 v8"),
            # within-document repeat: S2 twice around a unique separator
            Row(doc_id=3, source="B", lang="en", text=S2 + " w1 " + S2),
            # clean doc with windows, none repeated
            Row(doc_id=4, source="B", lang="en", text="x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
            # shorter than K tokens: zero windows by definition
            Row(doc_id=5, source="B", lang="en", text="y1 y2 y3 y4 y5"),
        ]
    )


def test_planted_cross_document_span(planted):
    r = {(x["source"], x["lang"]): x.asDict() for x in _span_group_metrics(planted).collect()}
    a = r[("A", "en")]
    assert a["n_docs"] == 2 and a["total_tokens"] == 32
    # 16 tokens -> 9 windows per doc
    assert a["span_total"] == 18
    # exactly the S1 window repeats (once per doc)
    assert a["span_flagged"] == 2
    assert a["span_docs_flagged"] == 2
    assert a["span_distinct_repeated"] == 1
    # each doc's S1 occupies 8 token positions
    assert a["span_covered_tokens"] == 16
    assert a["span_flagged_frac"] == round(2 / 18, 6)
    assert a["span_covered_frac"] == 0.5


def test_planted_within_document_repeat_and_short_doc(planted):
    r = {(x["source"], x["lang"]): x.asDict() for x in _span_group_metrics(planted).collect()}
    b = r[("B", "en")]
    assert b["n_docs"] == 3 and b["total_tokens"] == 32
    # d3: 17 tokens -> 10 windows; d4: 10 -> 3; d5: < K -> 0
    assert b["span_total"] == 13
    # the S2 window occurs twice WITHIN d3 -> both occurrences flagged
    assert b["span_flagged"] == 2
    assert b["span_docs_flagged"] == 1
    assert b["span_distinct_repeated"] == 1
    # d3 positions 1-8 and 10-17 (the separator w1 at 9 is uncovered)
    assert b["span_covered_tokens"] == 16
    assert b["span_covered_frac"] == 0.5


def test_null_source_lang_group_is_kept(spark, tmp_path):
    """A NULL source/lang group must appear in the profile (groupBy keeps
    NULL keys; the profile<->span join is null-safe on BOTH engines) —
    regression: a name-list equi-join silently dropped the whole group."""
    import duckdb as _duck

    from car_etl_spark.queries.textops import (
        DOC_CORPUS_PROFILE_SQL,
        doc_corpus_profile,
    )

    rows = [
        Row(doc_id=1, text=S1 + " " + S1, lang=None, source=None, n_chars=97),
        Row(doc_id=2, text=S1 + " z1 z2 z3", lang="en", source="A", n_chars=57),
        Row(doc_id=3, text=S2 + " q1 q2 q3", lang="en", source="A", n_chars=56),
    ]
    docs = spark.createDataFrame(rows)
    pq = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.parquet(pq)

    sdf = doc_corpus_profile(spark, str(tmp_path)).toPandas()
    assert len(sdf) == 2
    nullrow = sdf[sdf["source"].isna()]
    assert len(nullrow) == 1 and nullrow["lang"].isna().all()
    # d1 repeats S1 within itself: the group's span columns are real
    assert int(nullrow["span_flagged"].iloc[0]) >= 2

    con = _duck.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    odf = con.sql(DOC_CORPUS_PROFILE_SQL).df()
    key = ["source", "lang"]
    s = sdf.sort_values(key, na_position="first").reset_index(drop=True)
    o = odf.sort_values(key, na_position="first").reset_index(drop=True)
    o = o[s.columns.tolist()].astype(s.dtypes.to_dict())
    assert s.equals(o)


def test_span_report_matches_duckdb_twin(spark):
    sdf = (
        span_dedup_report(spark, SF_SMALL)
        .toPandas()
        .sort_values(["source", "lang"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_SMALL}/documents.parquet')"
    )
    odf = (
        con.sql(f"SELECT * FROM ({SPAN_GROUP_SQL}) ORDER BY source, lang")
        .df()
        .reset_index(drop=True)
    )
    odf = odf[sdf.columns.tolist()].astype(sdf.dtypes.to_dict())
    assert sdf.equals(odf)
    # the corpus has planted exact duplicates: flags must be non-trivial
    assert sdf["span_flagged"].sum() > 0
    assert 0 < (sdf["span_docs_flagged"] > 0).sum() < len(sdf)
