"""Incremental distinct-count sketch maintenance: per-group HLL
registers (and KMV hash sets) kept current under a document/event
stream, serveable at any moment without rescanning history.

The batch forms (``functions/sketches.py``) are full-corpus jobs; a
100 TB ingest pipeline maintains the STATE instead: per micro-batch,

1. sketch the new rows only (one bounded shuffle over the batch);
2. merge into the persisted state — register-wise max for HLL, distinct
   union + re-take-k for KMV;
3. publish the merged state as a new version (read-after-write safe:
   the current version is never overwritten in place; a sidecar records
   the active version and the sketch parameters).

Both merges are IDEMPOTENT (max / set-union), so a replayed or retried
batch is a natural no-op — no id-ledger needed, unlike the dedup
signature store whose pair emission is not idempotent.  The sidecar
refuses parameter drift (a p=9 register store merged with p=11 batch
registers is garbage with no error), the same discipline as the
signature store's family version and the IVF store's frozen quantizer.

State size is control-plane grain: ``groups x 2^p`` register rows +
``groups x k`` hashes, independent of stream volume — the reason this
scales where a "distinct ids seen" ledger would not.

Reference behavior covered: live distinct-activity reporting over
the append-only audit event stream (``src/audit/logger.py``,
``supabase/migrations/012_audit_logs.sql`` — distinct actors/documents
per tenant), re-expressed as sketch-state maintenance under Structured
Streaming.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from car_etl_spark.functions import sketches as SK


class SketchStoreParamError(RuntimeError):
    """Persisted sketch state was built with different (p, k) than this
    code computes — estimates from mixed-parameter states are silently
    wrong, so refuse instead."""


class IncrementalDistinctSketch:
    """Maintains per-group HLL + KMV distinct-count state for one
    (keys, value) spec under micro-batch appends."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        value_col: str,
        p: int = SK.HLL_P_DEFAULT,
        k: int = SK.KMV_K_DEFAULT,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.keys = list(keys)
        self.value_col = value_col
        self.p = p
        self.k = k
        self.meta_path = os.path.join(state_dir, "sketch_meta.json")
        os.makedirs(state_dir, exist_ok=True)

    # -- state files ---------------------------------------------------

    def _meta(self) -> dict | None:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                return json.load(f)
        return None

    def _check_params(self, meta: dict) -> None:
        stored = (meta.get("p"), meta.get("k"), meta.get("keys"), meta.get("value_col"))
        mine = (self.p, self.k, self.keys, self.value_col)
        if stored != tuple(mine[:2]) + (mine[2], mine[3]):
            raise SketchStoreParamError(
                f"sketch state at {self.state_dir} was built with "
                f"(p, k, keys, value)={stored}; this code computes {mine} — "
                "rebuild the state before resuming maintenance"
            )

    def _paths(self, version: int) -> tuple[str, str]:
        return (
            os.path.join(self.state_dir, f"hll_v{version}.parquet"),
            os.path.join(self.state_dir, f"kmv_v{version}.parquet"),
        )

    def _current(self) -> tuple[DataFrame, DataFrame, int] | None:
        meta = self._meta()
        if meta is None:
            return None
        self._check_params(meta)
        v = meta["version"]
        hp, kp = self._paths(v)
        return self.spark.read.parquet(hp), self.spark.read.parquet(kp), v

    # -- the foreachBatch body ----------------------------------------

    def process_batch(self, batch: DataFrame) -> None:
        """Merge one micro-batch into the state and publish the next
        version.  Replay-idempotent by algebra: max / set-union absorb
        repeated rows, so no batch ledger is kept."""
        from pyspark.sql import functions as F

        value = F.col(self.value_col).cast("string")
        regs_new = SK.hll_registers(batch, self.keys, value, self.p)
        kmv_new = SK.kmv_state(batch, self.keys, value, self.k)
        cur = self._current()
        if cur is None:
            merged_regs, merged_kmv, version = regs_new, kmv_new, 0
        else:
            regs_old, kmv_old, v = cur
            merged_regs = SK.hll_merge([regs_old, regs_new], self.keys)
            merged_kmv = SK.kmv_merge([kmv_old, kmv_new], self.keys, self.k)
            version = v + 1
        hp, kp = self._paths(version)
        # new version files first, then the sidecar flip (os.replace is
        # atomic) — a crash in between leaves the old version active
        merged_regs.write.mode("overwrite").parquet(hp)
        merged_kmv.write.mode("overwrite").parquet(kp)
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "p": self.p,
                    "k": self.k,
                    "keys": self.keys,
                    "value_col": self.value_col,
                    "version": version,
                },
                f,
            )
        os.replace(tmp, self.meta_path)
        if version > 0:
            import shutil

            for old in self._paths(version - 1):
                shutil.rmtree(old, ignore_errors=True)

    # -- serving -------------------------------------------------------

    def estimates(self) -> DataFrame | None:
        """(keys..., hll_distinct, kmv_distinct) from the current state,
        or None before the first batch."""
        cur = self._current()
        if cur is None:
            return None
        regs, kmv, _v = cur
        hll = SK.hll_estimate(regs, self.keys, self.p)
        km = SK.kmv_estimate(kmv, self.keys, self.k)
        return hll.join(km, self.keys)


def run_distinct_maintenance(
    spark: SparkSession,
    landing_dir: str,
    schema: str,
    sketch: IncrementalDistinctSketch,
    checkpoint_dir: str,
) -> None:
    """Drain a parquet landing dir into the sketch state (availableNow
    in tests, processingTime trigger in production) — the same
    foreachBatch discipline as the posting/IVF maintenance jobs."""
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    q = (
        stream.writeStream.foreachBatch(lambda df, _bid: sketch.process_batch(df))
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


class IncrementalFreqSketch:
    """Maintains a count-min frequency state under micro-batch appends.

    Counter addition is NOT replay-idempotent (unlike HLL's max / KMV's
    set-union), so this maintainer keeps the one piece of bookkeeping
    the distinct sketches can avoid: the sidecar records the last
    applied batch id, and replayed ids short-circuit — the standard
    exactly-once ``foreachBatch`` ledger, same contract as the posting
    store's ``_applied_<batch>`` sentinels.  Everything else mirrors
    :class:`IncrementalDistinctSketch`: versioned state files, atomic
    sidecar flip, parameter-drift refusal."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        keys: list[str],
        value_col: str,
        d: int = SK.CMS_D_DEFAULT,
        w: int = SK.CMS_W_DEFAULT,
    ) -> None:
        self.spark = spark
        self.state_dir = state_dir
        self.keys = list(keys)
        self.value_col = value_col
        self.d = d
        self.w = w
        self.meta_path = os.path.join(state_dir, "cms_meta.json")
        os.makedirs(state_dir, exist_ok=True)

    def _meta(self) -> dict | None:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                return json.load(f)
        return None

    def _check_params(self, meta: dict) -> None:
        stored = (meta.get("d"), meta.get("w"), meta.get("keys"), meta.get("value_col"))
        mine = (self.d, self.w, self.keys, self.value_col)
        if stored != mine:
            raise SketchStoreParamError(
                f"CMS state at {self.state_dir} was built with "
                f"(d, w, keys, value)={stored}; this code computes {mine} — "
                "rebuild the state before resuming maintenance"
            )

    def _path(self, version: int) -> str:
        return os.path.join(self.state_dir, f"cms_v{version}.parquet")

    def _current(self) -> tuple[DataFrame, int, int] | None:
        meta = self._meta()
        if meta is None:
            return None
        self._check_params(meta)
        return (
            self.spark.read.parquet(self._path(meta["version"])),
            meta["version"],
            meta["last_batch"],
        )

    def process_batch(self, batch: DataFrame, batch_id: int) -> bool:
        """Add one micro-batch's counters and publish the next version.
        Returns False for a replayed batch id (counter addition would
        double-count; the ledger makes the replay a no-op)."""
        from pyspark.sql import functions as F

        cur = self._current()
        last = cur[2] if cur is not None else -1
        if batch_id <= last:
            return False
        value = F.col(self.value_col).cast("string")
        new = SK.cms_state(batch, self.keys, value, self.d, self.w)
        if cur is None:
            merged, version = new, 0
        else:
            merged = SK.cms_merge([cur[0], new], self.keys)
            version = cur[1] + 1
        merged.write.mode("overwrite").parquet(self._path(version))
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "d": self.d,
                    "w": self.w,
                    "keys": self.keys,
                    "value_col": self.value_col,
                    "version": version,
                    "last_batch": int(batch_id),
                },
                f,
            )
        os.replace(tmp, self.meta_path)
        if version > 0:
            import shutil

            shutil.rmtree(self._path(version - 1), ignore_errors=True)
        return True

    def estimates(self, items: list[str]) -> DataFrame | None:
        """(keys..., item, cms_freq) for the probe set from the current
        state, or None before the first batch."""
        cur = self._current()
        if cur is None:
            return None
        return SK.cms_estimate(cur[0], self.keys, items, self.d, self.w)


def run_freq_maintenance(
    spark: SparkSession,
    landing_dir: str,
    schema: str,
    sketch: IncrementalFreqSketch,
    checkpoint_dir: str,
) -> None:
    """Drain a parquet landing dir into the CMS state — the batch id
    flows through to the ledger (exactly-once under replays)."""
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: sketch.process_batch(df, int(bid))
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
