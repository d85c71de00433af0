"""Capstone integration: the layers compose into the reference's whole
ingestion-to-search pipeline on one synthetic corpus.

ingest (mime routing + parsing) -> chunking -> posting index over the
CHUNKS (the reference indexes document_chunks, not documents) ->
keyword serving search -> enrichment join back to the source document.
Every layer is individually oracle-/unit-checked elsewhere; this test
pins that their CONTRACTS actually fit together — column names, id
flow, analyzer consistency between build and query side."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ingest_parse_chunk_index_search(spark, tmp_path):
    from car_etl_spark.functions.porter import porter_py
    from car_etl_spark.operators.chunking import chunk_by_tokens
    from car_etl_spark.operators.indexing import PostingStore
    from car_etl_spark.operators.ingest import route_and_parse

    # -- 1. raw media lands (bytes + mime), parser router extracts text
    docs = {
        1: "spark shuffles data between stages during wide transformations",
        2: "the quick brown fox jumps over the lazy dog near the river bank",
        3: "shuffling and partitioning decide how spark scales joins",
    }
    media = spark.createDataFrame(
        [(i, bytearray(t.encode()), "text/plain") for i, t in docs.items()],
        "media_id long, content binary, mime_type string",
    )
    parsed = route_and_parse(media)
    rows = {r.media_id: r for r in parsed.collect()}
    assert all(rows[i].parsed_text == t for i, t in docs.items())
    assert all(rows[i].parser_used == "plain_text" for i in docs)

    # -- 2. parsed text chunks into overlapping token windows
    chunked = chunk_by_tokens(
        parsed.select(F.col("media_id").alias("doc_id"),
                      F.col("parsed_text").alias("text")),
        max_tokens=6, overlap=2,
    )
    chunks = chunked.select(
        # chunk ids must stay joinable back to their document
        (F.col("doc_id") * 1000 + F.col("chunk_index")).alias("doc_id"),
        F.lit("en").alias("lang"),
        F.col("content").alias("text"),
    )
    n_chunks = chunks.count()
    assert n_chunks > len(docs)  # overlap produced multiple windows

    # -- 3. porter posting index over the CHUNKS (the reference's
    #       document_chunks fts shape), then serving-style search
    store = PostingStore(str(tmp_path / "chunk-postings"), analyzer="porter")
    store.build(chunks)
    terms = sorted({porter_py(t) for t in ("shuffling", "sparks")})
    buckets = sorted({store.bucket_of(t) for t in terms})
    hits = (
        store.read(spark, buckets=buckets)
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("tf") * F.col("weight")), 2).alias("rank_score"))
        .orderBy(F.desc("rank_score"), F.asc("doc_id"))
    )
    got = hits.collect()
    assert got, "porter stems must match inflection variants in chunks"
    # every hit resolves back to doc 1 or 3 (the spark/shuffle docs) —
    # porter conflated shuffling/shuffles and sparks/spark
    src_docs = {r.doc_id // 1000 for r in got}
    assert src_docs == {1, 3}

    # -- 4. enrichment join back to the parsed source (J2 shape)
    enriched = (
        hits.withColumn("media_id", (F.col("doc_id") / 1000).cast("long"))
        .join(parsed.select("media_id", "parsed_text"), "media_id")
    )
    assert enriched.count() == len(got)
    assert all("spark" in r.parsed_text or "shuffl" in r.parsed_text
               for r in enriched.collect())
