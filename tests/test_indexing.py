"""Materialized-index contracts: posting store + IVF layout.

Three invariant families:

1. **Serving == scan**: every serving-path query (persisted index) is
   value-identical to its build-path twin (per-call derivation from raw
   text / raw vectors) — the indexes change latency, never answers.
2. **Incremental == rebuild**: the LSM maintenance path (delta appends +
   tombstones) converges to exactly the posting table a full rebuild of
   the final corpus state produces, through mixed upsert/delete
   sequences, replays, and compaction.
3. **Exact probing prunes where it can**: the cluster-radius triangle
   bound certifies exactness everywhere (equality with brute force) and
   actually prunes partitions on clustered corpora.
"""

from __future__ import annotations

import os
import zlib

import pytest
from pyspark.sql import functions as F

from car_etl_spark.operators import indexing as IX
from car_etl_spark.queries import build_registry
from tests.conftest import SF_ORACLE, SF_SMALL


@pytest.fixture(scope="module")
def registry():
    return build_registry()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# -- 1. serving == scan ------------------------------------------------------


@pytest.mark.parametrize("sf", [SF_SMALL, SF_ORACLE])
def test_fts_serving_equals_scan(spark, registry, sf):
    serve = registry["fts_posting_search"].fn(spark, sf)
    scan = registry["fts_posting_scan"].fn(spark, sf)
    assert _rows(serve) == _rows(scan)


@pytest.mark.parametrize("sf", [SF_SMALL, SF_ORACLE])
def test_keyword_serving_equals_scan(spark, registry, sf):
    serve = registry["doc_keyword_search"].fn(spark, sf)
    scan = registry["doc_keyword_scan"].fn(spark, sf)
    assert _rows(serve) == _rows(scan)


@pytest.mark.parametrize("sf", [SF_SMALL, SF_ORACLE])
def test_ivf_serving_equals_bruteforce(spark, registry, sf):
    serve = registry["vector_ivf_topk"].fn(spark, sf)
    brute = registry["vector_topk"].fn(spark, sf)
    # ORDERED equality: the serving path must reproduce the exact ranking
    assert [tuple(r) for r in serve.collect()] == [tuple(r) for r in brute.collect()]


def test_term_bucket_python_spark_parity(spark):
    """The query side prunes with zlib.crc32; the store partitions with
    Spark's crc32 — one disagreement silently empties every search."""
    terms = ["spark", "window", "merge", "a", "zzz", "étude", "123", "class"]
    df = spark.createDataFrame([(t,) for t in terms], "term string").select(
        "term", IX.term_bucket_col(F.col("term")).alias("b")
    )
    got = {r.term: r.b for r in df.collect()}
    for t in terms:
        assert got[t] == IX.term_bucket_py(t) == zlib.crc32(t.encode()) % IX.NUM_BUCKETS


# -- 2. incremental == rebuild ----------------------------------------------


DOCS_V0 = [
    (1, "en", "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "en", "spark joins windows merge merges merged classes"),
    (3, "de", "der schnelle braune fuchs springt"),
    (4, "en", "alpha alpha beta beta alpha repeated tokens here"),
]
# batch 1: doc 2 changes, doc 5 is new; batch 2: doc 3 deleted, doc 1 changes
DOCS_B1 = [
    (2, "en", "spark streaming state store checkpoint replay"),
    (5, "en", "entirely new document with fresh vocabulary"),
]
DOCS_B2 = [(1, "en", "alpha beta rewritten shorter")]
FINAL_DOCS = [DOCS_B2[0], DOCS_B1[0], DOCS_B1[1], DOCS_V0[3]]  # doc 3 gone


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _live_postings(store, spark):
    df = store.read(spark).select(
        "doc_id", "lang", "raw_term", "term", "weight", "tf", "term_bucket"
    )
    return _rows(df)


@pytest.fixture()
def inc_store(spark, tmp_path):
    store = IX.PostingStore(str(tmp_path / "postings"))
    store.build(_docs_df(spark, DOCS_V0))
    return store


def _expected_final(spark, tmp_path):
    fresh = IX.PostingStore(str(tmp_path / "rebuild"))
    fresh.build(_docs_df(spark, FINAL_DOCS))
    return _live_postings(fresh, spark)


def test_incremental_equals_rebuild(spark, tmp_path, inc_store):
    assert inc_store.apply_batch(spark, _docs_df(spark, DOCS_B1), None, batch=1)
    assert inc_store.apply_batch(spark, _docs_df(spark, DOCS_B2), [3], batch=2)
    assert _live_postings(inc_store, spark) == _expected_final(spark, tmp_path)


def test_incremental_replay_is_noop(spark, tmp_path, inc_store):
    inc_store.apply_batch(spark, _docs_df(spark, DOCS_B1), None, batch=1)
    inc_store.apply_batch(spark, _docs_df(spark, DOCS_B2), [3], batch=2)
    before = _live_postings(inc_store, spark)
    # replayed batches short-circuit on the sentinel
    assert inc_store.apply_batch(spark, _docs_df(spark, DOCS_B1), None, batch=1) is False
    assert inc_store.apply_batch(spark, _docs_df(spark, DOCS_B2), [3], batch=2) is False
    assert _live_postings(inc_store, spark) == before


def test_half_applied_replay_does_not_double_tf(spark, tmp_path, inc_store):
    """A crash between the delta write and the sentinel leaves duplicate
    delta rows on replay; the read path's exact-duplicate drop makes the
    view identical anyway."""
    inc_store.apply_batch(spark, _docs_df(spark, DOCS_B1), None, batch=1)
    os.remove(inc_store._sentinel(1))  # simulate crash-before-sentinel
    assert inc_store.apply_batch(spark, _docs_df(spark, DOCS_B1), None, batch=1)
    once = IX.PostingStore(str(tmp_path / "once"))
    once.build(_docs_df(spark, DOCS_V0))
    once.apply_batch(spark, _docs_df(spark, DOCS_B1), None, batch=1)
    assert _live_postings(inc_store, spark) == _live_postings(once, spark)


def test_compaction_preserves_view(spark, tmp_path, inc_store):
    inc_store.apply_batch(spark, _docs_df(spark, DOCS_B1), None, batch=1)
    inc_store.apply_batch(spark, _docs_df(spark, DOCS_B2), [3], batch=2)
    before = _live_postings(inc_store, spark)
    inc_store.compact(spark)
    assert _live_postings(inc_store, spark) == before
    assert not store_has_files(inc_store.delta_dir)
    assert not store_has_files(inc_store.tomb_dir)


def store_has_files(d: str) -> bool:
    return os.path.isdir(d) and any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(d) for f in fs
    )


def test_delete_then_readd(spark, tmp_path, inc_store):
    """Tombstone at batch b kills only rows with batch < b — a doc
    re-added in a LATER batch comes back."""
    inc_store.apply_batch(spark, None, [2], batch=1)
    gone = {r[0] for r in _live_postings(inc_store, spark)}
    assert 2 not in gone
    inc_store.apply_batch(spark, _docs_df(spark, [DOCS_V0[1]]), None, batch=2)
    back = {r[0] for r in _live_postings(inc_store, spark)}
    assert 2 in back


# -- 3. exact probing --------------------------------------------------------


def _clustered_emb(spark, n_per=40, clusters=4, dim=8):
    """Tight planted clusters: members = centroid + small orthogonal
    jitter, so cluster radii are small and the triangle bound can prune."""
    import math
    import random

    rng = random.Random(7)
    base = []
    for c in range(clusters):
        center = [0.0] * dim
        center[2 * c] = 1.0
        center[2 * c + 1] = 0.3
        for i in range(n_per):
            vec = [x + rng.gauss(0.0, 0.02) for x in center]
            nrm = math.sqrt(sum(v * v for v in vec))
            base.append((c * n_per + i, c, [v / nrm for v in vec]))
    return spark.createDataFrame(base, "vec_id long, label int, embedding array<double>")


def test_exact_probe_prunes_clustered_corpus(spark, tmp_path):
    emb = _clustered_emb(spark)
    store = IX.IvfStore(str(tmp_path / "ivf"))
    store.build(emb, num_centroids=4, refine_iterations=2)
    qvec = emb.filter(F.col("vec_id") == 5).select("embedding").first()[0]
    probes = store.probe_ids_exact(list(qvec), k=10)
    assert 0 < len(probes) < 4, f"bound failed to prune: {probes}"
    # certified exactness: probed top-k == brute-force top-k
    got = [tuple(r) for r in store.probe_topk(spark, list(qvec), k=10).collect()]
    from car_etl_spark.functions import vectors as V

    brute = [
        tuple(r)
        for r in emb.select(
            "vec_id",
            "label",
            F.round(
                V.cosine_similarity(F.col("embedding"), V.literal_vector(list(qvec))), 6
            ).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(10)
        .collect()
    ]
    assert got == brute


def test_exact_probe_scans_all_when_unclusterable(spark):
    """On the near-random synthetic corpus the radii approach pi/2, the
    bound cannot certify pruning, and the probe set honestly widens to
    the full layout — exactness is never traded silently."""
    store = IX.ensure_ivf_index(spark, SF_SMALL)
    from car_etl_spark.queries.vector import _query_vec_list
    from car_etl_spark.tables import load_tables

    emb = load_tables(spark, SF_SMALL, ("embeddings",))["embeddings"]
    q = _query_vec_list(emb, cache_key=SF_SMALL)
    probes = store.probe_ids_exact(q, 20)
    assert len(probes) == store.meta()["num_centroids"]


def test_posting_store_matches_build_postings_rollup(spark):
    """The persisted store (grouped by raw_term) aggregates to exactly
    the stemmed posting table ``queries.fts.build_postings`` derives —
    the F20 materialization and the store are the same index."""
    from car_etl_spark.queries.fts import build_postings
    from car_etl_spark.tables import load_tables

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    store = IX.ensure_posting_index(spark, SF_SMALL)
    rolled = (
        store.read(spark)
        .groupBy("doc_id", "term", "weight")
        .agg(F.sum("tf").alias("tf"))
    )
    assert _rows(rolled) == _rows(build_postings(docs))
