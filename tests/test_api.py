"""Service-facade tests: the reference's route surface as engine calls,
using the driver's documents/embeddings tables as the corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from car_etl_spark import api
from car_etl_spark.tables import load_tables
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def corpus(spark):
    t = load_tables(spark, SF_SMALL, ("documents", "embeddings"))
    return t["documents"], t["embeddings"]


def _query_vec(emb):
    [row] = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    return F.array(*[F.lit(float(x)) for x in row.embedding])


def test_search_modes(spark, corpus):
    docs, emb = corpus
    kw = api.search(docs, emb, ("spark", "join"), mode="keyword", limit=10).collect()
    assert 0 < len(kw) <= 10
    assert kw[0].score >= kw[-1].score

    qv = _query_vec(emb)
    vec = api.search(docs, emb, (), qv, mode="vector", limit=10).collect()
    assert len(vec) == 10
    assert vec[0].doc_id == 0 and abs(vec[0].score - 1.0) < 1e-6  # self-match tops

    hyb = api.search(docs, emb, ("spark", "join"), qv, mode="hybrid", limit=10).collect()
    assert len(hyb) == 10
    # a doc present in both legs outranks single-leg docs (RRF property)
    both = [r for r in hyb if r.kw_rank is not None and r.vec_rank is not None]
    only = [r for r in hyb if r.kw_rank is None or r.vec_rank is None]
    if both and only:
        assert max(r.rrf_score for r in both) >= max(r.rrf_score for r in only)

    with pytest.raises(ValueError):
        api.search(docs, emb, (), None, mode="vector")
    with pytest.raises(ValueError):
        api.search(docs, emb, (), None, mode="nonsense")


def test_search_cap(spark, corpus):
    docs, emb = corpus
    out = api.search(docs, emb, ("the",), mode="keyword", limit=500)
    assert out.count() <= api.SEARCH_RESULT_CAP


def test_ask_returns_cited_answer(spark, corpus):
    docs, emb = corpus
    qv = _query_vec(emb)
    [row] = api.ask(docs, emb, ("spark", "join"), qv, top_k=10).collect()
    assert row.answer.startswith("Based on the retrieved context")
    assert row.citation_count > 0
    assert row.fully_cited is True  # stub cites only retrieved docs
    assert 0 < row.confidence < 1


def test_effective_rent_endpoints(spark):
    from car_etl_spark.queries.analytics import _customer_revenue

    rents = _customer_revenue(spark, SF_SMALL)
    [s] = api.effective_rent_summary(rents).collect()
    assert s.tenant_count == rents.count()
    assert s.highest >= s.average >= s.lowest
    assert abs(s.total_annual - 12 * s.total_monthly) < 1.0

    by_seg = api.effective_rent_by_group(rents, "c_mktsegment").collect()
    assert len(by_seg) == 5
    assert by_seg[0].total_rent >= by_seg[-1].total_rent

    conc = api.concentration(rents, "c_custkey", top_n=10).collect()
    assert len(conc) == 10
    assert [r.rank for r in conc] == list(range(1, 11))
    cums = [r.cumulative_pct for r in conc]
    assert all(b >= a for a, b in zip(cums, cums[1:]))
    assert conc[0].pct_of_total == pytest.approx(conc[0].cumulative_pct)


def test_prepare_serving_warm_boot(spark, tmp_path, monkeypatch):
    """The warm-boot hook executes each serving mode once against the
    resident stores and reports per-mode boot seconds — after it, the
    first real request is the warm path (cold-after-prepare <= 2x warm
    measured at sf1.0 in COLDBOOT_r09.json; this pins the contract:
    full coverage of SERVING_MODE_NAMES, subset selection, and that a
    prepared mode's next call serves identical rows)."""
    monkeypatch.setenv("CAR_ETL_INDEX_DIR", str(tmp_path / "idx"))
    from car_etl_spark.queries.suites import SERVING_MODE_NAMES, serving_modes

    assert set(serving_modes()) == set(SERVING_MODE_NAMES)
    subset = ("doc_keyword_search", "vector_ivf_topk", "fts_posting_search")
    boot = api.prepare_serving(spark, SF_SMALL, modes=subset)
    assert set(boot) == set(subset)
    assert all(t >= 0 for t in boot.values())
    fn = serving_modes()["doc_keyword_search"]
    first = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
    again = [tuple(r) for r in fn(spark, SF_SMALL).collect()]
    assert first == again and len(first) > 0
