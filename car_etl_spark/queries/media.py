"""Hard-signal row for the multimodal decode kernels (SURVEY.md §2.1
S2 / §2.10 multimodal boundary).

The pipeline synthesizes PNG/BMP/WAV/JPEG/AVI binaries whose parameters
(dimensions, gray level, sample rate, channels, duration, amplitude,
frame count, frame interval) are pure arithmetic over ``doc_id``,
routes them through the REAL decode path — magic-byte dispatch
(:func:`multimodal.detect_mime`), the zlib/RFC 2083 PNG kernel (all
five scanline filters, one per asset), the 24-bit BMP kernel, the
PCM16 WAV kernel (strict mode), the T.81 JPEG SOF header parse, and
the RIFF/AVI container walk (strict mode, header-vs-movi frame-count
cross-check) — and aggregates the DECODED features per format.  The
video leg also runs the frame SAMPLER over the real ``00dc`` chunks:
every-2nd-frame row counts must equal ``ceil(n_frames/2)`` recomputed
arithmetically by the oracle.  The DuckDB oracle recomputes the expected aggregates from
the same arithmetic WITHOUT touching a byte, so any decode regression,
mime misroute, or silent fall-through to the deterministic fake
(whose dimensions are >= 64, far off the synthesized 4-16 range)
flips the value hash.

JPEG luma is excluded from the report: pixel decode is codec-bound by
declared contract (``multimodal.py``), only the header dimensions are
real, and the report only aggregates real fields.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from car_etl_spark.queries import QuerySpec
from car_etl_spark.tables import load_tables

#: every 7th document becomes a synthetic asset; cycling doc_id % 5
#: over multiples of 7 covers all five formats (PNG/BMP/WAV/JPEG/AVI,
#: gcd(7,5)=1)
ASSET_STRIDE = 7


def _asset_params(docs: DataFrame) -> DataFrame:
    """Arithmetic parameter table — each column is recomputable in SQL."""
    d = F.col("doc_id")
    return docs.filter(d % ASSET_STRIDE == 0).select(
        "doc_id",
        (d % 5).cast("int").alias("fmt_code"),
        (F.lit(4) + d % 13).cast("int").alias("w"),
        (F.lit(3) + d % 7).cast("int").alias("h"),
        (d % 256).cast("int").alias("gray"),
        (d % 5).cast("int").alias("png_filter"),
        (F.lit(8000) * (F.lit(1) + d % 3)).cast("int").alias("sr"),
        (F.lit(1) + d % 2).cast("int").alias("ch"),
        (F.lit(100) + F.lit(10) * (d % 20)).cast("int").alias("ms"),
        (d % 1000).cast("int").alias("amp"),
        (F.lit(3) + d % 12).cast("int").alias("nframes"),
        # frame interval restricted to exact-millisecond rates
        # (5/10/20/25 fps) so duration arithmetic is integer on both sides
        F.element_at(
            F.array(F.lit(200), F.lit(100), F.lit(50), F.lit(40)),
            ((d % 4) + 1).cast("int"),
        ).cast("int").alias("mspf"),
    )


def synthesize_media(params: DataFrame) -> DataFrame:
    """mapInPandas encode stage: parameters -> real binary payloads
    (the write half of the multimodal contract; the spec-faithful
    encoders live beside the decode kernels in
    ``operators/multimodal.py``)."""
    from car_etl_spark.operators.multimodal import (
        synth_avi,
        synth_bmp,
        synth_jpeg,
        synth_png,
        synth_wav,
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                code = int(r.fmt_code)
                if code == 0:
                    content = synth_png(int(r.w), int(r.h), int(r.gray), int(r.png_filter))
                elif code == 1:
                    content = synth_bmp(int(r.w), int(r.h), int(r.gray))
                elif code == 2:
                    frames = int(r.sr) * int(r.ms) // 1000
                    content = synth_wav(int(r.sr), int(r.ch), frames, int(r.amp))
                elif code == 4:
                    content = synth_avi(int(r.w), int(r.h), int(r.nframes), int(r.mspf))
                else:
                    content = synth_jpeg(int(r.w), int(r.h))
                rows.append({"path": str(r.doc_id), "content": content})
            yield pd.DataFrame(rows, columns=["path", "content"])

    return params.mapInPandas(gen, "path string, content binary")


def media_features_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-format rollup of REAL decoded features (see module doc).

    r13 (guide §4): the four decode legs + the resize leg + the frame
    sampler are FUSED into one ``mapInPandas`` pass
    (:func:`~car_etl_spark.operators.multimodal.extract_media_features_wide`)
    running the SAME kernels with the same per-leg strictness — the
    payload bytes cross the JVM->Python boundary once per asset instead
    of five times, the AVI container is decoded once instead of twice
    (features + sampler), and the checkpoint now holds one SKINNY
    feature row per asset instead of the binary payloads.  The four
    per-format aggregates below are pure relational work over that
    frame and compute exactly the values the per-leg forms computed
    (pinned by tests/test_udfs_multimodal.py's fused-parity test and
    this row's oracle hash)."""
    from car_etl_spark.operators.multimodal import (
        detect_mime,
        extract_media_features_wide,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select("doc_id")
    media = synthesize_media(_asset_params(docs)).withColumn(
        "mime_type", detect_mime(F.col("content"))
    )
    # resize targets (w//2+1, h//2+1) come from the same parameter
    # arithmetic the oracle recomputes; joined in before the fused pass
    # so PNG/BMP rows carry their target dims
    params = _asset_params(docs).select(
        F.col("doc_id").cast("string").alias("path"),
        F.expr("w DIV 2 + 1").cast("int").alias("out_w"),
        F.expr("h DIV 2 + 1").cast("int").alias("out_h"),
    )
    # one decode pass -> bounded skinny features frame, materialized
    # once (the r12 checkpoint held the binary payloads; four disjoint
    # aggregate branches would otherwise re-run the Python stage)
    feats = extract_media_features_wide(
        media.join(params, "path"), sample_every_n_frames=2
    ).localCheckpoint(eager=True)
    null_l = F.lit(None).cast("long")

    # image formats: PNG + BMP decode for real; JPEG carries real
    # header dimensions with a stubbed luma, which the aggregate
    # excludes — detect_mime is part of what the hash checks (a
    # misrouted asset lands in the wrong group)
    img_agg = feats.filter(
        ~F.col("mime_type").isin("audio/wav", "video/avi")
    ).groupBy(F.col("mime_type").alias("format")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("height").cast("long").alias("sum_height"),
        F.sum(
            F.when(F.col("mime_type") != "image/jpeg", F.col("mean_luma"))
        ).cast("long").alias("sum_luma"),
        null_l.alias("sum_sample_rate"),
        null_l.alias("sum_channels"),
        null_l.alias("sum_duration_ms"),
        null_l.alias("sum_amplitude"),
        null_l.alias("sum_frames"),
        null_l.alias("sum_sampled"),
    )

    # resize round-trip: PNG/BMP rasters resampled to (w//2+1, h//2+1),
    # re-encoded as BMP, RE-DECODED through the real kernel — constant-
    # gray sources come back at the target dims with luma == gray
    rs_agg = feats.filter(
        F.col("mime_type").isin("image/png", "image/bmp")
    ).groupBy(F.lit("image/resized").alias("format")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("r_width").cast("long").alias("sum_width"),
        F.sum("r_height").cast("long").alias("sum_height"),
        F.sum("r_luma").cast("long").alias("sum_luma"),
        null_l.alias("sum_sample_rate"),
        null_l.alias("sum_channels"),
        null_l.alias("sum_duration_ms"),
        null_l.alias("sum_amplitude"),
        null_l.alias("sum_frames"),
        null_l.alias("sum_sampled"),
    )

    # video: real RIFF/AVI container walk (strict), the every-2nd-frame
    # sampler count over the real 00dc chunks riding the same row
    vid_agg = feats.filter(F.col("mime_type") == "video/avi").groupBy(
        F.col("mime_type").alias("format")
    ).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("height").cast("long").alias("sum_height"),
        null_l.alias("sum_luma"),
        null_l.alias("sum_sample_rate"),
        null_l.alias("sum_channels"),
        F.sum("duration_ms").cast("long").alias("sum_duration_ms"),
        null_l.alias("sum_amplitude"),
        F.sum("n_frames").cast("long").alias("sum_frames"),
        F.sum("n_sampled").cast("long").alias("sum_sampled"),
    )

    # audio: strict mode — a non-PCM16 or corrupt stream raises
    aud_agg = feats.filter(F.col("mime_type") == "audio/wav").groupBy(
        F.col("mime_type").alias("format")
    ).agg(
        F.count(F.lit(1)).alias("n_assets"),
        null_l.alias("sum_width"),
        null_l.alias("sum_height"),
        null_l.alias("sum_luma"),
        F.sum("sample_rate").cast("long").alias("sum_sample_rate"),
        F.sum("n_channels").cast("long").alias("sum_channels"),
        F.sum("duration_ms").cast("long").alias("sum_duration_ms"),
        F.sum("mean_abs_amplitude").cast("long").alias("sum_amplitude"),
        null_l.alias("sum_frames"),
        null_l.alias("sum_sampled"),
    )
    return (
        img_agg.unionByName(aud_agg)
        .unionByName(vid_agg)
        .unionByName(rs_agg)
        .orderBy("format")
    )


MEDIA_FEATURES_SQL = """
WITH p AS (
  SELECT doc_id, doc_id % 5 AS fmt_code,
         4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h, doc_id % 256 AS gray,
         8000 * (1 + doc_id % 3) AS sr, 1 + doc_id % 2 AS ch,
         100 + 10 * (doc_id % 20) AS ms, doc_id % 1000 AS amp,
         3 + doc_id % 12 AS nframes,
         CASE doc_id % 4 WHEN 0 THEN 200 WHEN 1 THEN 100
                         WHEN 2 THEN 50 ELSE 40 END AS mspf
  FROM documents WHERE doc_id % 7 = 0
), tagged AS (
  SELECT *, CASE fmt_code WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/bmp'
                          WHEN 2 THEN 'audio/wav' WHEN 4 THEN 'video/avi'
                          ELSE 'image/jpeg' END AS format
  FROM p
)
SELECT * FROM (
SELECT format,
       COUNT(*) AS n_assets,
       CAST(SUM(CASE WHEN fmt_code IN (0, 1, 3, 4) THEN w END) AS BIGINT) AS sum_width,
       CAST(SUM(CASE WHEN fmt_code IN (0, 1, 3, 4) THEN h END) AS BIGINT) AS sum_height,
       CAST(SUM(CASE WHEN fmt_code IN (0, 1) THEN gray END) AS BIGINT) AS sum_luma,
       CAST(SUM(CASE WHEN fmt_code = 2 THEN sr END) AS BIGINT) AS sum_sample_rate,
       CAST(SUM(CASE WHEN fmt_code = 2 THEN ch END) AS BIGINT) AS sum_channels,
       CAST(SUM(CASE WHEN fmt_code = 2 THEN ms
                     WHEN fmt_code = 4 THEN nframes * mspf END) AS BIGINT) AS sum_duration_ms,
       CAST(SUM(CASE WHEN fmt_code = 2 THEN amp END) AS BIGINT) AS sum_amplitude,
       CAST(SUM(CASE WHEN fmt_code = 4 THEN nframes END) AS BIGINT) AS sum_frames,
       CAST(SUM(CASE WHEN fmt_code = 4 THEN (nframes + 1) // 2 END) AS BIGINT) AS sum_sampled
FROM tagged GROUP BY format
UNION ALL
-- the resize leg: (w DIV 2 + 1, h DIV 2 + 1) nearest-neighbor targets;
-- constant-gray sources keep luma == gray exactly through the
-- raster -> resample -> BMP re-encode -> re-decode round trip
SELECT 'image/resized' AS format,
       COUNT(*) AS n_assets,
       CAST(SUM(w // 2 + 1) AS BIGINT) AS sum_width,
       CAST(SUM(h // 2 + 1) AS BIGINT) AS sum_height,
       CAST(SUM(gray) AS BIGINT) AS sum_luma,
       CAST(NULL AS BIGINT) AS sum_sample_rate,
       CAST(NULL AS BIGINT) AS sum_channels,
       CAST(NULL AS BIGINT) AS sum_duration_ms,
       CAST(NULL AS BIGINT) AS sum_amplitude,
       CAST(NULL AS BIGINT) AS sum_frames,
       CAST(NULL AS BIGINT) AS sum_sampled
FROM tagged WHERE fmt_code IN (0, 1)
GROUP BY 1  -- grouped like the per-format arms: zero rows on an
            -- assetless corpus, matching Spark's empty-groupBy
) ORDER BY format
"""


QUERIES: dict[str, QuerySpec] = {
    "media_features_report": QuerySpec(
        media_features_report, MEDIA_FEATURES_SQL, ("multimodal", "decode")
    ),
}
