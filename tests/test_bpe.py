"""Real BPE: trained merges, greedy-by-rank segmentation, Spark path.

Pinned properties of the Sennrich et al. (2016) algorithm:
- the hand-computable textbook example learns the expected first merges;
- segmentation is LOSSLESS (concatenating tokens rebuilds word + EOW);
- more merges never increase a word's token count (monotone compression);
- zero merges degrade to characters+EOW; and
- the Arrow-batched Spark counter equals the literal driver-side count.
"""

from __future__ import annotations

from car_etl_spark.functions import bpe as B


def test_textbook_merges():
    """The classic low/lower/newest/widest corpus from the paper: 'es'
    then 'est' then 'est</w>' dominate the pair counts."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = B.train_bpe(freqs, 3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", B.EOW)
    ranks = {p: i for i, p in enumerate(merges)}
    assert B.bpe_segment("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert B.bpe_segment("lowest", ranks) == ["l", "o", "w", "est</w>"]


def test_segmentation_lossless_and_monotone():
    words = {"banana": 4, "bandana": 3, "ananas": 2, "cabana": 5}
    prev_counts = None
    for k in (0, 2, 4, 8, 16):
        ranks = {p: i for i, p in enumerate(B.train_bpe(words, k))}
        counts = {}
        for w in words:
            seg = B.bpe_segment(w, ranks)
            assert "".join(seg) == w + B.EOW  # lossless
            counts[w] = len(seg)
        if k == 0:
            assert all(counts[w] == len(w) + 1 for w in words)
        if prev_counts is not None:
            assert all(counts[w] <= prev_counts[w] for w in words)
        prev_counts = counts


def test_spark_counts_match_literal(spark):
    from tests.conftest import SF_SMALL

    from car_etl_spark.tables import load_tables

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"].limit(50)
    merges = B.train_bpe_from_corpus(docs, num_merges=80)
    assert len(merges) == 80
    got = {
        r.doc_id: r.bpe_tokens
        for r in B.bpe_token_counts(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for r in docs.select("doc_id", "text").collect():
        expect = sum(len(B.bpe_segment(w, ranks)) for w in r.text.lower().split())
        assert got[r.doc_id] == expect
    # trained merges compress: fewer tokens than characters, more than words
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for did, text in list(texts.items())[:5]:
        n_words = len(text.split())
        n_chars_plus = sum(len(w) + 1 for w in text.lower().split())
        assert n_words <= got[did] <= n_chars_plus


def test_unicode_whitespace_alignment(spark):
    """Training (Java ASCII \\s+) and counting (Python ASCII \\s+) must
    tokenize identically: a non-breaking space is NOT a separator on
    either side, so 'foo\\u00a0bar' stays one trained word."""
    docs = spark.createDataFrame(
        [(1, "foo\u00a0bar foo\u00a0bar baz")], "doc_id long, text string"
    )
    freqs = B.word_frequencies(docs, min_count=1)
    assert freqs == {"foo\u00a0bar": 2, "baz": 1}
    merges = B.train_bpe(freqs, 10)
    [row] = B.bpe_token_counts(docs, merges).select("bpe_tokens").collect()
    ranks = {p: i for i, p in enumerate(merges)}
    expect = 2 * len(B.bpe_segment("foo\u00a0bar", ranks)) + len(
        B.bpe_segment("baz", ranks)
    )
    assert row.bpe_tokens == expect


def test_incremental_trainer_matches_reference_and_scales():
    """The incremental trainer must produce the EXACT merge list of the
    naive recount-everything reference implementation (same selection
    rule), and handle a 20k-word vocabulary x 300 merges in seconds."""
    import random
    import time

    def naive_train(word_freqs, num_merges):
        from collections import Counter as C

        seqs = {}
        for w, n in word_freqs.items():
            k = tuple(w) + (B.EOW,)
            seqs[k] = seqs.get(k, 0) + n
        merges = []
        for _ in range(num_merges):
            pairs = C()
            for seq, n in seqs.items():
                for i in range(len(seq) - 1):
                    pairs[(seq[i], seq[i + 1])] += n
            if not pairs:
                break
            best_n = max(pairs.values())
            best = min(p for p, c in pairs.items() if c == best_n)
            merges.append(best)
            merged = best[0] + best[1]
            new_seqs = {}
            for seq, n in seqs.items():
                out, i = [], 0
                while i < len(seq):
                    if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                new_seqs[tuple(out)] = new_seqs.get(tuple(out), 0) + n
            seqs = new_seqs
        return merges

    rng = random.Random(42)
    small = {
        "".join(rng.choice("abcdef") for _ in range(rng.randrange(2, 9))): rng.randrange(1, 50)
        for _ in range(300)
    }
    assert B.train_bpe(small, 60) == naive_train(small, 60)

    big = {
        "".join(rng.choice("abcdefghijklmnop") for _ in range(rng.randrange(3, 12))): rng.randrange(1, 100)
        for _ in range(20_000)
    }
    t0 = time.perf_counter()
    merges = B.train_bpe(big, 300)
    assert len(merges) == 300
    assert time.perf_counter() - t0 < 30


# ---------------------------------------------------------------------------
# round-6: capped training collect + persisted merge store


def test_word_frequencies_capped_in_job(spark):
    """The driver collect is bounded: min_count prunes the hapax tail
    IN the Spark job, top_n is a deterministic hard cap (count desc,
    word asc), and merges above the threshold are unaffected by
    pruning words below it (the subword-nmt --min-frequency
    property)."""
    # heavy-tail synthetic vocabulary: 3 frequent words + 40 hapaxes
    hapaxes = " ".join(f"hapax{i:02d}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, "alpha alpha alpha beta beta gamma gamma " + hapaxes)],
        "doc_id long, text string",
    )
    capped = B.word_frequencies(docs, min_count=2)
    assert capped == {"alpha": 3, "beta": 2, "gamma": 2}
    top2 = B.word_frequencies(docs, min_count=2, top_n=2)
    assert top2 == {"alpha": 3, "beta": 2}  # tie (beta/gamma @2) -> lexicographic
    full = B.word_frequencies(docs, min_count=1, top_n=None)
    assert len(full) == 43
    # merges above the threshold are identical with or without the tail
    assert B.train_bpe(capped, 6) == B.train_bpe(
        {w: n for w, n in full.items() if n >= 2}, 6
    )


def test_bpe_store_spark_and_python_builders_agree(spark, tmp_path, monkeypatch):
    """The Spark-built merge table and the pure-Python oracle builder
    must produce IDENTICAL artifacts (shared tokenizer + trainer +
    deterministic tie-breaks) — whichever side builds first, the other
    reuses the same learned vocabulary."""
    import pyarrow.parquet as pq

    from car_etl_spark.operators import bpe_store as S
    from tests.conftest import SF_SMALL

    monkeypatch.setenv("CAR_ETL_INDEX_DIR", str(tmp_path / "idx"))
    # Spark-first build
    merges_spark = S.ensure_bpe_merges(spark, SF_SMALL, num_merges=32)
    store = S.bpe_store_path(SF_SMALL, num_merges=32)
    assert merges_spark == S.load_merges(store)
    # Python oracle builder finds the Spark-built merges and reuses them
    assert S.ensure_bpe_oracle_artifacts(SF_SMALL, num_merges=32) == store
    # independent Python-side training from the pyarrow frequency pass
    freqs, words = S._py_word_lists(f"{SF_SMALL}/documents.parquet")
    merges_py = B.train_bpe(S._apply_caps(freqs, B.DEFAULT_MIN_COUNT, B.DEFAULT_TOP_N), 32)
    assert merges_py == merges_spark
    # the vocabulary twin covers every distinct corpus word with the
    # segment count the production pandas_udf would produce
    vt = pq.read_table(S.vocab_counts_path(store))
    vocab = dict(zip(vt.column("word").to_pylist(), vt.column("n_tokens").to_pylist()))
    assert sorted(vocab) == words
    ranks = {p: i for i, p in enumerate(merges_spark)}
    assert all(vocab[w] == len(B.bpe_segment(w, ranks)) for w in words)


def test_bpe_store_reuse_no_retrain(spark, tmp_path, monkeypatch):
    """Content-addressed reuse: the second ensure is a file read, not a
    retrain (merges.parquet untouched), and a parameter change gets its
    own store."""
    import os

    from car_etl_spark.operators import bpe_store as S
    from tests.conftest import SF_SMALL

    monkeypatch.setenv("CAR_ETL_INDEX_DIR", str(tmp_path / "idx"))
    first = S.ensure_bpe_merges(spark, SF_SMALL, num_merges=16)
    path = S._merges_file(S.bpe_store_path(SF_SMALL, num_merges=16))
    stamp = os.stat(path).st_mtime_ns
    again = S.ensure_bpe_merges(spark, SF_SMALL, num_merges=16)
    assert again == first
    assert os.stat(path).st_mtime_ns == stamp
    other = S.bpe_store_path(SF_SMALL, num_merges=17)
    assert other != S.bpe_store_path(SF_SMALL, num_merges=16)
