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

# ASCII \s+ split — the SAME tokenization as the training side's Java
# regex split (Java \s is ASCII-only by default); Python's str.split()
# is Unicode-aware and would count words the frequency table never
# trained on (e.g. around non-breaking spaces)
_ASCII_WS = None


def tokenize_py(text: str | None) -> list[str]:
    """Pure-Python twin of the Spark-side tokenization
    (``lower -> split \\s+ -> drop empties``) — the single definition
    both the counting pandas_udf and the DuckDB-oracle vocabulary
    builder share, so the three backends cannot drift."""
    global _ASCII_WS
    if _ASCII_WS is None:
        import re

        _ASCII_WS = re.compile(r"\s+", re.ASCII)
    return [w for w in _ASCII_WS.split((text or "").lower()) if w]


#: training-vocabulary caps.  At web scale the RAW vocabulary (typos,
#: ids, URLs) is 10^8-10^9 entries and an uncapped collect dies; merge
#: learning only ever selects pairs by FREQUENCY, so pruning the hapax
#: tail is the standard practice (subword-nmt's --min-frequency;
#: Sennrich et al. 2016 §4 train on frequency tables the same way) and
#: leaves every merge above the threshold untouched.  The top-N cap is
#: the hard byte bound: whatever the corpus, the driver collects at
#: most top_n rows (most-frequent first, lexicographic tie-break, so
#: the cut is deterministic).
DEFAULT_MIN_COUNT = 2
DEFAULT_TOP_N = 200_000


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = DEFAULT_MIN_COUNT,
    top_n: int | None = DEFAULT_TOP_N,
) -> dict[str, int]:
    """The corpus word-frequency table: lowercase whitespace tokens ->
    count.  One tokenize + one groupBy job; the collect is CAPPED
    in-job (``n >= min_count`` filter + deterministic top-``top_n``)
    so the driver never holds more than ``top_n`` rows regardless of
    corpus size — the cap is what makes driver-side merge learning a
    control-plane operation at 100 TB."""
    wf = (
        docs.select(
            F.explode(
                F.split(F.regexp_replace(F.lower(F.col(text_col)), r"^\s+", ""), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        wf = wf.filter(F.col("n") >= min_count)
    if top_n is not None:
        # TakeOrderedAndProject, not a global sort: Spark turns
        # orderBy+limit into a per-partition top-N + driver merge
        wf = wf.orderBy(F.desc("n"), F.asc("w")).limit(top_n)
    rows = wf.collect()
    return {r.w: r.n for r in rows}


def train_bpe(word_freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules: repeatedly merge the most
    frequent adjacent symbol pair (ties broken lexicographically for
    determinism).  Pure driver-side; returns merges in rank order.

    Incremental (the standard Sennrich optimization): pair counts and a
    pair -> sequences inverted index are maintained across iterations,
    so each merge touches only the sequences that CONTAIN the merged
    pair instead of recounting the whole vocabulary — without this, a
    realistic vocabulary (~10^6 words) times the default merge budget
    is billions of Counter increments and the 'control-plane cheap'
    claim dies."""
    from collections import defaultdict

    seqs: dict[tuple[str, ...], int] = {}
    for w, n in word_freqs.items():
        k = tuple(w) + (EOW,)
        seqs[k] = seqs.get(k, 0) + n
    pair_counts: Counter = Counter()
    where: defaultdict = defaultdict(set)
    for seq, n in seqs.items():
        for i in range(len(seq) - 1):
            p = (seq[i], seq[i + 1])
            pair_counts[p] += n
            where[p].add(seq)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        for seq in list(where.get(best, ())):
            n = seqs.pop(seq, None)
            if n is None:
                continue  # stale index entry (sequence already rewritten)
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                where[p].discard(seq)
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new = tuple(out)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] += n
                where[p].add(new)
            seqs[new] = seqs.get(new, 0) + n
        pair_counts.pop(best, None)
        where.pop(best, None)
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
    docs: DataFrame,
    num_merges: int = 500,
    text_col: str = "text",
    min_count: int = DEFAULT_MIN_COUNT,
    top_n: int | None = DEFAULT_TOP_N,
) -> list[tuple[str, str]]:
    """End-to-end trainer: corpus -> capped word-frequency job ->
    driver-side merge learning."""
    return train_bpe(word_frequencies(docs, text_col, min_count, top_n), num_merges)


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
            for w in tokenize_py(text):
                n = cache.get(w)
                if n is None:
                    n = len(bpe_segment(w, ranks))
                    cache[w] = n
                total += n
            return total

        return texts.map(one)

    return docs.withColumn(out_col, count_tokens(F.col(text_col)))
