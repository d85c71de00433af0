"""S9: external parser services as a Spark boundary (Tika-protocol client).

The reference calls out to parser services over HTTP — Apache Tika
(``src/extraction/parsers/tika.py:31-125``: PUT ``/tika`` with the
document's Content-Type and ``Accept: text/plain``, 60 s timeout, an
optional best-effort PUT ``/meta`` whose failure is swallowed, and page
splitting driven by the ``xmpTPg:NPages`` metadata key), with the
router providing a primary -> fallback chain and all-failed raising
``ParserError`` (``src/extraction/router.py:193-260``).

Spark-native shape: the HTTP calls happen EXECUTOR-SIDE inside
``mapInPandas`` — each Arrow batch of (id, content, mime_type) rows is
parsed against the service chain and yields a row per document with the
``ParseResult``-shaped columns (``parsers/base.py:28-37``).  Errors are
DATA, not exceptions: a document whose whole chain failed carries the
last error string in its ``error`` column (the distributed analog of
``ParserError`` — one poison document must not kill a 100 TB job).

Scale notes:
- connections are made per-request via stdlib ``urllib`` (no extra
  deps); at cluster scale the per-executor fan-out to the service is
  bounded by task slots, so the service sees at most
  (executors x cores) concurrent requests — the same back-pressure
  story as the reference's worker pool.
- per-service ``timeout_sec`` bounds straggler tasks; ``retries``
  (default 0, matching the reference: it does NOT retry, it falls
  back) re-attempts TRANSIENT failures only (timeouts, connection
  errors, HTTP 5xx).  HTTP 4xx is permanent for that service and
  skips straight to the next one in the chain.
- the chain is data-plane config (plain tuples), so a route table can
  map mime types to different chains without new code.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

TIMEOUT_NORMAL = 60.0  # reference tika.py:16
TIMEOUT_HEALTH_CHECK = 5.0  # reference tika.py:17


@dataclass(frozen=True)
class ParserService:
    """One HTTP parser endpoint in a fallback chain."""

    name: str
    base_url: str
    timeout_sec: float = TIMEOUT_NORMAL
    retries: int = 0  # transient-failure re-attempts (reference: 0)
    backoff_sec: float = 0.0  # deterministic linear backoff between tries


class TransientServiceError(Exception):
    """Timeout / connection failure / HTTP 5xx — retryable."""


class PermanentServiceError(Exception):
    """HTTP 4xx — this service will never parse this document."""


def _http_put(url: str, content: bytes, headers: dict, timeout: float) -> bytes:
    """PUT raw bytes, return response body.  Raises Transient/Permanent
    per the status-class split above."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=content, headers=headers, method="PUT")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read()
    except urllib.error.HTTPError as e:
        # read+close so the connection can be reused by the OS
        body = e.read()
        del body
        if 400 <= e.code < 500:
            raise PermanentServiceError(f"HTTP {e.code}") from e
        raise TransientServiceError(f"HTTP {e.code}") from e
    except urllib.error.URLError as e:
        reason = getattr(e, "reason", e)
        if isinstance(reason, TimeoutError) or "timed out" in str(reason):
            raise TransientServiceError("Request timeout") from e
        raise TransientServiceError(f"Request failed: {reason}") from e
    except TimeoutError as e:  # raw socket timeout surfaces directly too
        raise TransientServiceError("Request timeout") from e


def _split_pages(text: str, num_pages: int) -> list[tuple[int, str]]:
    """The reference's page heuristic (tika.py:95-125): equal char
    slices when metadata reports multiple pages, whole text otherwise;
    empty slices are dropped."""
    pages: list[tuple[int, str]] = []
    if num_pages > 1 and text:
        chars_per_page = len(text) // num_pages
        for i in range(num_pages):
            start = i * chars_per_page
            end = (i + 1) * chars_per_page if i < num_pages - 1 else len(text)
            page_text = text[start:end].strip()
            if page_text:
                pages.append((i + 1, page_text))
    elif text.strip():
        pages.append((1, text))
    return pages


def parse_one(service: ParserService, content: bytes, mime_type: str) -> dict:
    """Parse one document against one service (the reference's
    ``TikaParser.parse``), with the configured transient-retry budget.

    Returns a ParseResult-shaped dict; raises Transient/PermanentServiceError
    if every attempt failed."""
    headers = {"Content-Type": mime_type, "Accept": "text/plain"}
    text_url = f"{service.base_url.rstrip('/')}/tika"
    last: Exception | None = None
    for attempt in range(service.retries + 1):
        if attempt and service.backoff_sec:
            time.sleep(service.backoff_sec * attempt)
        try:
            text = _http_put(text_url, content, headers, service.timeout_sec).decode(
                "utf-8", errors="replace"
            )
            break
        except PermanentServiceError:
            raise  # 4xx: do not burn retries, do not pass go
        except TransientServiceError as e:
            last = e
    else:
        raise last  # type: ignore[misc]

    # metadata is OPTIONAL (reference tika.py:72-87): any failure is
    # swallowed and parsing proceeds with a single page
    metadata: dict = {}
    try:
        meta_url = f"{service.base_url.rstrip('/')}/meta"
        raw = _http_put(meta_url, content, headers, min(service.timeout_sec, 30.0))
        metadata = json.loads(raw.decode("utf-8", errors="replace"))
        if not isinstance(metadata, dict):
            metadata = {}
    except Exception:
        metadata = {}

    num_pages = 1
    if "xmpTPg:NPages" in metadata:
        try:
            num_pages = int(metadata["xmpTPg:NPages"])
        except (ValueError, TypeError):
            pass

    return {
        "text": text,
        "pages": _split_pages(text, num_pages),
        "num_pages": num_pages,
        "parser_used": service.name,
    }


def parse_with_chain(
    chain: tuple[ParserService, ...], content: bytes, mime_type: str
) -> dict:
    """The router's fallback walk (``router.py:245-260``): try each
    service in order; first success wins; if all fail, return an
    error-carrying result instead of raising (errors are data in the
    distributed plan)."""
    errors: list[str] = []
    for service in chain:
        try:
            return {**parse_one(service, content, mime_type), "error": None}
        except (TransientServiceError, PermanentServiceError) as e:
            errors.append(f"{service.name}: {e}")
    return {
        "text": None,
        "pages": [],
        "num_pages": 0,
        "parser_used": None,
        "error": "; ".join(errors) if errors else "empty parser chain",
    }


PARSE_RESULT_FIELDS = [
    StructField("parsed_text", StringType()),
    StructField(
        "pages",
        ArrayType(
            StructType(
                [
                    StructField("page_number", IntegerType()),
                    StructField("text", StringType()),
                ]
            )
        ),
    ),
    StructField("num_pages", IntegerType()),
    StructField("parser_used", StringType()),
    StructField("error", StringType()),
]


def parse_documents_via_services(
    df: DataFrame,
    chain: tuple[ParserService, ...],
    id_col: str = "media_id",
    content_col: str = "content",
    mime_col: str = "mime_type",
) -> DataFrame:
    """S9 as a distributed operator: (id, content, mime) ->
    ParseResult columns via executor-side HTTP against the service
    chain.  ``mapInPandas`` keeps the bytes in Arrow batches (no
    per-row serialization), and the output schema is fixed so the
    downstream plan doesn't depend on service behavior."""
    out_schema = StructType(
        [df.schema[id_col], df.schema[mime_col]] + PARSE_RESULT_FIELDS
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r[content_col]
                if content is None:
                    res = {
                        "text": None,
                        "pages": [],
                        "num_pages": 0,
                        "parser_used": None,
                        "error": "null content",
                    }
                else:
                    res = parse_with_chain(chain, bytes(content), r[mime_col] or "")
                rows.append(
                    {
                        id_col: r[id_col],
                        mime_col: r[mime_col],
                        "parsed_text": res["text"],
                        "pages": [
                            {"page_number": p[0], "text": p[1]} for p in res["pages"]
                        ],
                        "num_pages": res["num_pages"],
                        "parser_used": res["parser_used"],
                        "error": res["error"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(id_col, content_col, mime_col).mapInPandas(run, out_schema)


def health_check(service: ParserService) -> bool:
    """Reference ``tika.py:129-145``: GET ``/tika`` (Tika answers its
    banner there) with the short health timeout; 200 is healthy,
    everything else (including connection failure) is not."""
    import urllib.error
    import urllib.request

    try:
        req = urllib.request.Request(
            f"{service.base_url.rstrip('/')}/tika", method="GET"
        )
        with urllib.request.urlopen(req, timeout=TIMEOUT_HEALTH_CHECK) as resp:
            return resp.status == 200
    except Exception:
        return False


def route_parse_with_service_fallback(
    media: DataFrame,
    chain: tuple[ParserService, ...],
    id_col: str = "media_id",
    content_col: str = "content",
    mime_col: str = "mime_type",
) -> DataFrame:
    """S7+S9 composed: the built-in parser chain first
    (:func:`car_etl_spark.operators.ingest.route_and_parse`), then the
    external service chain for ONLY the rows every built-in parser
    failed — Tika's documented role as the universal fallback
    (``router.py:252-259`` falling back into ``tika.py``).

    The service boundary sees just the failed slice (an anti-selection,
    usually a tiny fraction), so external-call volume scales with the
    failure rate, not the corpus.  Output schema matches
    ``route_and_parse`` plus the service columns: ``parsed_text`` /
    ``parser_used`` coalesce built-in-first; ``parse_error`` carries
    the service chain's error for rows nothing could parse."""
    from car_etl_spark.operators.ingest import route_and_parse

    # both the failed slice and the final join read `routed`;
    # materialize it once via localCheckpoint so mime routing + every
    # built-in parse attempt (including content hashing) runs ONCE per
    # document, not twice.  localCheckpoint (not .cache()): its blocks
    # are reclaimed by the ContextCleaner when the frame goes out of
    # scope, so repeated calls in a long-running session cannot
    # accumulate parse results in executor storage memory
    routed = route_and_parse(media, content_col=content_col).localCheckpoint(eager=True)
    failed = routed.filter(
        F.col("parsed_text").isNull() & F.col(content_col).isNotNull()
    ).select(id_col, content_col, mime_col)
    serviced = parse_documents_via_services(
        failed, chain, id_col=id_col, content_col=content_col, mime_col=mime_col
    ).select(
        id_col,
        F.col("parsed_text").alias("__svc_text"),
        F.col("parser_used").alias("__svc_parser"),
        F.col("error").alias("__svc_error"),
    )
    return (
        routed.join(serviced, id_col, "left")
        .select(
            *[c for c in routed.columns if c not in ("parsed_text", "parser_used")],
            F.coalesce(F.col("parsed_text"), F.col("__svc_text")).alias("parsed_text"),
            F.coalesce(F.col("parser_used"), F.col("__svc_parser")).alias("parser_used"),
            F.when(
                F.col("parsed_text").isNull() & F.col("__svc_text").isNull(),
                F.coalesce(
                    F.col("__svc_error"),
                    F.when(F.col(content_col).isNull(), F.lit("null content")),
                ),
            ).alias("parse_error"),
        )
    )
