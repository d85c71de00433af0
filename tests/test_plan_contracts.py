"""Physical-plan contracts for the headline queries.

The plan audit in ARCHITECTURE.md §2 as REGRESSION TESTS: each contract
pins a property that makes the query scale — filters reaching the
parquet scan, dimension joins broadcasting, top-k compiling to
TakeOrderedAndProject instead of a global sort, and hard bans on the
two scale-killers (SortMergeJoin where a broadcast is intended,
CartesianProduct anywhere).  Exchange counts are pinned as upper
bounds: a refactor that silently adds a shuffle fails here long before
it shows up in a 100 TB bill.
"""

from __future__ import annotations

import pytest

from car_etl_spark.queries import build_registry
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def registry():
    return build_registry()


def _plan(spark, registry, name: str) -> str:
    from car_etl_spark.queries.suites import fine_grained_queries

    fn = registry[name].fn if name in registry else fine_grained_queries()[name]
    df = fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # a prepared (memoized) DataFrame may already be AQE-finalized from
    # an earlier test's execution, in which case toString() prints BOTH
    # the final and the initial plan — count contracts against the
    # final section only
    marker = "+- == Initial Plan =="
    if marker in plan:
        plan = plan.split(marker)[0]
    return plan


# (query, max_exchanges, must_contain, must_not_contain)
CONTRACTS = [
    # q1: scan -> partial agg -> 1 shuffle -> final agg -> 1 sort exchange
    ("q1_pricing_summary", 2, ["PushedFilters: ["], []),
    # q5: every dim join broadcasts; no sort-merge fallback
    ("q5_local_supplier_volume", 7, ["BroadcastHashJoin", "PushedFilters: ["], ["SortMergeJoin"]),
    # exact vector top-k: map-only + TakeOrderedAndProject, ZERO shuffles
    ("vector_topk", 0, ["TakeOrderedAndProject"], ["Exchange"]),
    # IVF serving top-k: probed partitions only (PartitionFilters on the
    # persisted layout), exact rescoring, zero shuffles
    ("vector_ivf_topk", 0,
     ["TakeOrderedAndProject", "PartitionFilters: [centroid_id"], ["Exchange"]),
    # keyword search SERVING path: pruned posting-store scan (partition
    # pruning on term_bucket + term predicate pushed into parquet), one
    # aggregation exchange over only the matching posting rows
    ("doc_keyword_search", 1,
     ["TakeOrderedAndProject", "PartitionFilters: [term_bucket"], ["SortMergeJoin"]),
    # keyword search BUILD-PATH twin: one corpus scan, zero shuffles
    ("doc_keyword_scan", 0, ["TakeOrderedAndProject"], ["Exchange"]),
    # FTS serving path: pruned store scan; sum + countDistinct agg pair
    ("fts_posting_search", 2,
     ["TakeOrderedAndProject", "PartitionFilters: [term_bucket"], ["SortMergeJoin"]),
    # porter analyzer serves from its own bucket-pruned store
    ("fts_porter_search", 2,
     ["TakeOrderedAndProject", "PartitionFilters: [term_bucket"], ["SortMergeJoin"]),
    ("fts_plainto_search", 2,
     ["TakeOrderedAndProject", "PartitionFilters: [term_bucket"], ["SortMergeJoin"]),
    # BM25: one bucket-pruned store pass — (doc,term) agg, df via a
    # whole-partition window on the same grain (no second aggregation
    # branch, no join), final doc agg; dl rides on the rows so length
    # normalization adds nothing
    ("fts_bm25_search", 3,
     ["TakeOrderedAndProject", "PartitionFilters: [term_bucket", "Window"],
     ["SortMergeJoin", "BroadcastHashJoin"]),
    # phrase: one pruned pass, one agg exchange — per-term position
    # arrays pivot via conditional collect, adjacency is array math
    ("fts_phrase_search", 1,
     ["TakeOrderedAndProject", "PartitionFilters: [term_bucket"],
     ["SortMergeJoin", "BroadcastHashJoin"]),
    # both hybrid legs index-resident: bucket-pruned postings + IVF
    # partition pruning.  (The full-outer fusion join itself may
    # sort-merge — full outer cannot broadcast — but only over the two
    # O(limit) rank-limited legs.)
    ("hybrid_porter_ivf_search", 8,
     ["PartitionFilters: [term_bucket", "PartitionFilters: [centroid_id"],
     ["CartesianProduct"]),
    # flagship (r12 shape): the customer-grain aggregate is materialized
    # once (localCheckpoint — ReusedExchange could not fire across the
    # column-pruned total/top-k branches), so the OUTER plan is two
    # ExistingRDD scans + the single-row total broadcast + TakeOrdered.
    # The join strategy of the hidden subtree is pinned separately in
    # test_customer_revenue_subtree_broadcasts.
    ("flagship_portfolio_rollup", 3, ["TakeOrderedAndProject"],
     ["SortMergeJoin"]),
    # EAV pivot: conditional aggregation, bounded shuffles, broadcast vocab
    ("eav_pivot_effective_rent", 3, ["BroadcastHashJoin"], ["SortMergeJoin"]),
    # rerank page (r10 fused): both hybrid legs stay index-resident
    # (bucket + centroid pruning); the rerank slice is ONE linear chain —
    # guarded-expression scoring + two single-partition windows over the
    # 15-row page, NO head/tail Union (a union re-evaluates the page
    # subtree per branch: TakeOrderedAndProject is not exchange-reusable)
    # and NO global orderBy (range sampling job per serve).  Exchange
    # bound 2: the kw-leg agg shuffle (+1 AQE artifact headroom); the
    # full-outer fusion SMJ runs exchange-free on single-partition legs.
    ("hybrid_rerank_page", 2,
     ["PartitionFilters: [term_bucket", "PartitionFilters: [centroid_id"],
     ["CartesianProduct", "Union"]),
    # PII counts: one corpus pass, map-side partial agg, ONE exchange for
    # the global rollup, explode on the single aggregated row
    ("pii_entity_counts", 1, [], ["SortMergeJoin", "CartesianProduct"]),
    # RAG context fold (registry row): retrieval from the bucket-pruned
    # posting store; the match set is bounded by a LOSSLESS limit(6000)
    # (score > 0 => token_count >= 1 => cum_tokens(r) >= r) that
    # compiles to TakeOrderedAndProject BEFORE any global window, and
    # the bounded top side is the broadcast build of the text fetch —
    # both global windows only ever see a <= budget-row slice
    ("rag_context_modes", 3,
     ["TakeOrderedAndProject(limit=6000", "PartitionFilters: [term_bucket",
      "BroadcastHashJoin"],
     ["SortMergeJoin", "CartesianProduct"]),
    # RAG context fold (raw-scan twin): one corpus pass, lossless
    # limit(6000) -> TakeOrderedAndProject, ZERO exchanges — the rank
    # and cum-sum windows run over the bounded slice only
    ("rag_context_budget", 0,
     ["TakeOrderedAndProject(limit=6000"], ["Exchange"]),
    # substring serving: bucket-pruned trigram store, gram IN-predicate
    # pushed, one agg exchange for the per-doc position pivot (+1 for
    # the output sort)
    ("doc_substring_search", 2,
     ["PartitionFilters: [term_bucket"], ["SortMergeJoin", "CartesianProduct"]),
    # regex serving: candidate ids resolved at prepare time and PUSHED
    # into the documents scan as an IN-predicate — the prepared plan is
    # one pruned scan + the regex filter + sort, NO join for Catalyst
    # to push the regex engine below
    ("doc_regex_search", 1,
     ["PushedFilters: [In(doc_id"], ["Join", "CartesianProduct"]),
    # continuous-aggregate serving: reads ONLY the rollup store's
    # minute partials — the raw events table must not appear in the plan
    ("events_rollup_served", 3, [], ["events.parquet", "SortMergeJoin"]),
]


@pytest.mark.parametrize("name,max_ex,need,forbid", CONTRACTS,
                         ids=[c[0] for c in CONTRACTS])
def test_plan_contract(spark, registry, name, max_ex, need, forbid):
    plan = _plan(spark, registry, name)
    n_ex = plan.count("Exchange")
    assert n_ex <= max_ex, f"{name}: {n_ex} exchanges (contract: <= {max_ex})\n{plan[:3000]}"
    for token in need:
        assert token in plan, f"{name}: expected {token!r} in plan\n{plan[:3000]}"
    for token in forbid:
        assert token not in plan, f"{name}: forbidden {token!r} in plan\n{plan[:3000]}"


def test_customer_revenue_subtree_broadcasts(spark):
    """The flagship/top5 shared subtree materializes behind a
    localCheckpoint (r12), which hides its joins from the outer plan
    contract — so pin them here directly: dimension joins broadcast,
    no sort-merge fallback, and the two-level aggregate keeps its
    single shuffle pair."""
    from car_etl_spark.queries.analytics import _customer_revenue

    df = _customer_revenue(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert plan.count("Exchange") <= 4, plan[:3000]


def test_no_cartesian_products_anywhere(spark, registry):
    """CartesianProduct is banned across the whole registry — every
    intended cross join must be a broadcast of a tiny frame (which
    compiles to BroadcastNestedLoopJoin), never a partitioned cartesian."""
    offenders = []
    for name, spec in registry.items():
        plan = _plan(spark, registry, name)
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"CartesianProduct in: {offenders}"


def test_pq_shortlist_scan_never_reads_the_embedding_column(spark, registry):
    """The PQ mode's bytes claim as a plan contract: the shortlist pass
    scans (id, pq_code, pq_err) with the embedding column ABSENT from
    its ReadSchema — parquet column pruning is what makes the code
    column ~12-117x cheaper than the vector column, and a refactor
    that silently widens the scan re-reads the corpus."""
    plan = _plan(spark, registry, "vector_pq_topk")
    # no scan may read BOTH the code and the embedding column — fusing
    # them would re-read the corpus bytes the PQ layout exists to skip
    for ln in plan.splitlines():
        if "FileScan" in ln and "pq_code" in ln:
            assert "embedding" not in ln, ln
    emb_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "embedding" in ln
    ]
    assert emb_scans, "no embedding rescore scan found in the pq plan"
    # r8 fused shape: the code pass rides the PREPARED plan (paid once,
    # code-only by construction), so the SERVED job is a single
    # embedding scan — either id-pushed (In(vec_id) from the collected
    # survivors) or, in the near-tie regime where the certificate
    # honestly covers ~every probed row, the plain probed rescore.
    # Either way the serve carries NO code scan and NO survivor join;
    # those only return past the 10k-id cap (not reachable at this sf).
    assert not any(
        "FileScan" in ln and "pq_code" in ln for ln in plan.splitlines()
    ), "pq serve re-paid the code pass (join fallback) on the test corpus"
    assert "Join" not in plan, plan
    # the certified probe set still prunes the store partitions
    assert "PartitionFilters: [centroid_id" in plan or "centroid_id IN" in plan
