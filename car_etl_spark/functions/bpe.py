"""Real byte-pair encoding: corpus-trained merges + subword tokenize.

The reference counts context tokens with tiktoken
(``src/rag/context_builder.py:7-19``); its exact vocabulary is model
data, so this engine ships the ALGORITHM for real instead — classic
BPE (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units" — public): train merge rules from the
corpus's own word frequencies, then tokenize by applying merges in
rank order.  Tiktoken-exact counts remain a declared non-goal (the
vocab is the model's, not derivable); what this closes is the
"BPE-ish regex" approximation — token counts now come from an actual
learned subword segmentation.

Scale shape: training runs DRIVER-SIDE over the corpus's word-
frequency table — vocabulary, not corpus (Heaps' law: ~10^5-10^6
distinct words at 100 TB, the same control-plane argument as the
Porter vocabulary join).  The ONE Spark job extracts that table
(tokenize + groupBy count).  Tokenizing applies merges per DISTINCT
word inside an Arrow-batched pandas_udf with a per-batch word cache,
so the merge loop cost also scales with vocabulary, not tokens.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel (Sennrich §3.2) — keeps "est" in "est</w>"
#: distinct from "est" mid-word, so merges respect word boundaries
EOW = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> dict[str, int]:
    """The corpus word-frequency table: lowercase whitespace tokens ->
    count.  One tokenize + one groupBy job; the collect is vocabulary-
    sized (control-plane)."""
    rows = (
        docs.select(
            F.explode(
                F.split(F.regexp_replace(F.lower(F.col(text_col)), r"^\s+", ""), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r.w: r.n for r in rows}


def train_bpe(word_freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules: repeatedly merge the most
    frequent adjacent symbol pair (ties broken lexicographically for
    determinism).  Pure driver-side; returns merges in rank order."""
    seqs: dict[tuple[str, ...], int] = {}
    for w, n in word_freqs.items():
        seqs[tuple(w) + (EOW,)] = seqs.get(tuple(w) + (EOW,), 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for seq, n in seqs.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += n
        if not pairs:
            break
        best_n = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, n in seqs.items():
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            new_seqs[key] = new_seqs.get(key, 0) + n
        seqs = new_seqs
    return merges


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize ONE word: start from characters + EOW, repeatedly apply
    the lowest-ranked applicable merge (the standard greedy-by-rank
    application, matching how training built the vocabulary)."""
    seq = list(word) + [EOW]
    while len(seq) > 1:
        best_rank, best_i = None, None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def train_bpe_from_corpus(
    docs: DataFrame, num_merges: int = 500, text_col: str = "text"
) -> list[tuple[str, str]]:
    """End-to-end trainer: corpus -> word-frequency job -> driver-side
    merge learning."""
    return train_bpe(word_frequencies(docs, text_col), num_merges)


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Per-document learned-BPE token count via an Arrow-batched
    pandas_udf.  The merge table broadcasts with the closure; segmenting
    memoizes per distinct word within each batch, so the merge loop
    cost tracks vocabulary, not token volume."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("long")
    def count_tokens(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def one(text: str) -> int:
            total = 0
            for w in (text or "").lower().split():
                n = cache.get(w)
                if n is None:
                    n = len(bpe_segment(w, ranks))
                    cache[w] = n
                total += n
            return total

        return texts.map(one)

    return docs.withColumn(out_col, count_tokens(F.col(text_col)))
