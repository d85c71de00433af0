"""Model/service boundary UDFs (SURVEY.md §2.10 X1-X9).

Every genuinely-external boundary in the reference (OpenAI embeddings,
LLM extraction, cross-encoder rerank, Presidio NER) becomes an
Arrow-batched Pandas UDF here — the only places Python touches row data.
Each has a DETERMINISTIC implementation so pipelines remain testable and
oracle-adjacent; swapping in a real model is a one-line change of the
inner function, the Spark plumbing (batching, schema, iterator reuse)
is the part that matters at 100 TB.

Batching follows the reference's service constants: embeddings batch 100
texts per call (``src/search/embeddings.py:17``), rerank scores top-k
candidate lists (``src/search/reranker.py:76-152``).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, FloatType, StringType

EMBED_DIM = 64
EMBED_BATCH_SIZE = 100  # reference src/search/embeddings.py:17


def _hash_embed(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic unit-norm embedding from sha256 rounds."""
    if text is None:
        text = ""
    vals: list[float] = []
    seed = text.encode("utf-8", errors="replace")
    counter = 0
    while len(vals) < dim:
        h = hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        for i in range(0, len(h) - 3, 4):
            if len(vals) >= dim:
                break
            u = int.from_bytes(h[i : i + 4], "big")
            vals.append((u / 2**32) * 2.0 - 1.0)
        counter += 1
    norm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / norm for v in vals]


@F.pandas_udf(ArrayType(FloatType()))
def embed_text(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """X4: embedding generation — iterator form so per-executor client
    setup happens once; internal sub-batching mirrors the 100-text API
    contract of the real service."""
    for series in batches:
        out = []
        for start in range(0, len(series), EMBED_BATCH_SIZE):
            chunk = series.iloc[start : start + EMBED_BATCH_SIZE]
            out.extend(_hash_embed(t) for t in chunk)
        yield pd.Series(out)


@F.pandas_udf(StringType())
def detect_document_type(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """X2: document-type detection over the first 2000 chars (reference
    ``src/extraction/extractor.py:78-131``) — keyword heuristic stub."""
    def classify(text: str) -> str:
        head = (text or "")[:2000].lower()
        if "rent" in head and "roll" in head:
            return "rent_roll"
        if "lease" in head or "tenant" in head:
            return "lease"
        if "operating" in head or "noi" in head:
            return "financial_statement"
        return "lease"

    for series in batches:
        yield series.map(classify)


@F.pandas_udf(StringType())
def llm_extract_fields(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """X1: LLM field extraction stub — emits the reference's
    ``ExtractionResult``-shaped JSON (``src/extraction/extractor.py:35-47``)
    deterministically: field values derived from text statistics, so the
    downstream EAV persistence path is fully exercisable."""
    import json

    def extract(text: str) -> str:
        text = text or ""
        toks = text.split()
        fields = {
            "tenant_name": {
                "value": (toks[0].title() + " Holdings") if toks else None,
                "confidence": 0.9,
                "page": 1,
            },
            "base_rent": {
                "value": f"${(len(text) % 9000) + 1000}.00",
                "confidence": 0.85,
                "page": 1,
            },
            "square_footage": {
                "value": f"{(len(toks) * 37) % 50000 + 500}",
                "confidence": 0.8,
                "page": 2,
            },
        }
        return json.dumps({"fields": fields, "document_type": "lease", "overall_confidence": 0.85})

    for series in batches:
        yield series.map(extract)


@F.pandas_udf(DoubleType())
def rerank_score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """X5: cross-encoder rerank stub — deterministic query-document
    score in [0, 1] from a content hash (real model: same signature,
    ``predict_batch_udf`` over the top-20)."""
    def score(text: str) -> float:
        h = hashlib.sha256((text or "").encode("utf-8", errors="replace")).digest()
        return int.from_bytes(h[:8], "big") / 2**64

    for series in batches:
        yield series.map(score)


# ---------------------------------------------------------------------------
# PII redaction (X6/X7) — the regex-deterministic subset is pure Column
# expressions (JVM-side); the NER-model path would be a pandas_udf with
# the same output contract.

PII_PATTERNS = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "SSN": r"\b\d{3}-\d{2}-\d{4}\b",
    "PHONE": r"\b\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b",
}


def redact_pii(c: Column, mode: str = "mask") -> Column:
    """X7: redaction modes mask/hash/none (reference
    ``src/extraction/redactor.py:21-103``).

    mask: replace each match with ``[TYPE]``; hash: replace each match
    with ``[TYPE:sha2-8]`` of THAT MATCHED VALUE — so the same email in
    two documents maps to the same pseudonym and two different emails in
    one document get distinct pseudonyms (cross-document linkability,
    matching the reference's per-value hashing); none: passthrough.
    """
    if mode == "none":
        return c
    out = c
    for name, pattern in PII_PATTERNS.items():
        if mode == "mask":
            out = F.regexp_replace(out, pattern, f"[{name}]")
        else:  # hash mode: pseudonym per MATCHED VALUE, not per field
            # split() yields the n+1 non-match segments, regexp_extract_all
            # the n matches; interleave hashed matches back between the
            # segments.  All JVM-side Column ops — no Python in the loop.
            segs = F.split(out, pattern)
            tokens = F.transform(
                F.regexp_extract_all(out, F.lit(pattern), F.lit(0)),
                lambda m: F.concat(
                    F.lit(f"[{name}:"), F.substring(F.sha2(m, 256), 1, 8), F.lit("]")
                ),
            )
            out = F.concat(
                F.array_join(
                    F.zip_with(
                        F.slice(segs, 1, F.size(tokens)), tokens, lambda s, t: F.concat(s, t)
                    ),
                    "",
                ),
                F.element_at(segs, -1),
            )
    return out
