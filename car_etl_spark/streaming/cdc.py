"""Connector CDC: versioned upsert, tombstones, delta-token protocol.

The reference's SharePoint/Drive delta sync (S5/S6/T2/T8) has three
invariants this module re-expresses Spark-first:

1. **Immutability** — changed content NEVER updates a document row; a
   new version is inserted with ``parent_id`` linking the chain and the
   same content hash is a no-op
   (``src/connectors/sharepoint/sync.py:228-280``: "Always INSERT,
   never UPDATE").
2. **Tombstones** — source deletions are logged to a separate
   deletions table; the documents table is untouched and the "current"
   view subtracts tombstoned sources
   (``sharepoint/sync.py:282-333``, ``043_document_source_deletions``).
3. **Delta tokens** — the incremental cursor persists per connector;
   an invalidated token resets to a fresh start token and the sync
   REPROCESSES everything, which is safe because unchanged hashes
   no-op (``src/connectors/google_drive/sync.py:301-335``).

Spark mapping: change feeds land as files; ``apply_change_batch`` is
the ``foreachBatch`` body (pure DataFrame-in/DataFrame-out so it is
batch-testable); the token store is driver-side control plane (tiny,
per-connector) while all content diffing is distributed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: documents-table schema contract (version chain per source_path)
DOC_COLUMNS = (
    "doc_id", "source_path", "file_hash", "version", "parent_id", "is_current", "synced_at"
)


class TokenInvalidatedError(Exception):
    """Raised by a change-feed reader when the saved delta token is no
    longer accepted by the source (the Drive 'invalid token' case)."""


class DeltaTokenStore:
    """Per-connector delta-token persistence (T2).

    The reference stores the token in the connector's config row; here a
    JSON file under the connector's state dir plays that role.  The
    token is CONTROL PLANE — one small value per connector — so
    driver-side file I/O is the right altitude; offsets for the data
    plane live in the streaming checkpoint.
    """

    def __init__(self, state_dir: str, connector_id: str) -> None:
        os.makedirs(state_dir, exist_ok=True)
        self._path = os.path.join(state_dir, f"{connector_id}.token.json")

    def load(self) -> str | None:
        if not os.path.exists(self._path):
            return None
        with open(self._path) as f:
            return json.load(f)["delta_token"]

    def save(self, token: str) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"delta_token": token}, f)
        os.replace(tmp, self._path)  # atomic: a crash never half-writes

    def reset(self) -> None:
        if os.path.exists(self._path):
            os.remove(self._path)


def apply_change_batch(
    changes: DataFrame, existing: DataFrame, tombstones: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """One CDC application: (new document versions, new tombstones).

    ``changes``: (source_path, file_hash, change_type['upsert'|'delete'],
    changed_at).  ``existing``: current documents table (DOC_COLUMNS).
    ``tombstones``: prior deletion log (source_path, doc_id, deleted_at)
    — needed so a delete→re-create cycle produces a NEW version instead
    of no-oping against the tombstoned one.  Returns frames to APPEND —
    never rows to update (immutability).

    Multiple changes for one source_path within a batch are reduced to
    the LATEST by changed_at first (delete wins a timestamp tie, like
    the reference processing changes in feed order with deletions
    logged last) — without this, two upserts in one batch would both
    join the same prev row and fork the version chain at prev+1.

    - upsert with an unseen source_path  -> version 1, no parent
    - upsert with a changed file_hash    -> version+1, parent = previous
      current doc, and the caller demotes the previous version via
      :func:`demote_superseded`
    - upsert with the same file_hash     -> no-op (idempotent resync)
      UNLESS the current version is tombstoned: a re-created file gets
      a fresh version so it reappears in the serving view (the
      reference logs deletions per document_id —
      ``043_document_source_deletions.sql`` UNIQUE(document_id,
      source_type) — so a re-ingested document is never suppressed)
    - delete of a known source_path      -> tombstone row keyed by the
      deleted version's doc_id (documents table untouched)

    All joins key on source_path — at scale both sides partition on it,
    and the per-batch change set is small (broadcast side).
    """
    changes = (
        changes.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("source_path").orderBy(
                    F.desc("changed_at"),
                    # deterministic tie-break at equal timestamps: treat the
                    # delete as the later event (feed emits deletions last)
                    F.when(F.col("change_type") == "delete", 1).otherwise(0).desc(),
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    dead_ids = (
        tombstones.select(F.col("doc_id").alias("prev_doc_id"), F.lit(True).alias("prev_dead"))
        .distinct()
        if tombstones is not None
        else None
    )
    # NOTE: dead_ids is the full append-only deletion log — it grows
    # without bound, so it must NOT be broadcast (the per-batch-small
    # side here is `changes`, not the log); the join below stays
    # unhinted and partitions on doc_id at scale.
    current = existing.filter(F.col("is_current")).select(
        "source_path",
        F.col("doc_id").alias("prev_doc_id"),
        F.col("file_hash").alias("prev_hash"),
        F.col("version").alias("prev_version"),
    )
    if dead_ids is not None:
        current = current.join(dead_ids, "prev_doc_id", "left")
    else:
        current = current.withColumn("prev_dead", F.lit(None).cast("boolean"))
    upserts = (
        changes.filter(F.col("change_type") == "upsert")
        .join(current, "source_path", "left")
        .filter(
            F.col("prev_hash").isNull()
            | (F.col("prev_hash") != F.col("file_hash"))
            | F.coalesce(F.col("prev_dead"), F.lit(False))  # re-create after delete
        )
    )
    new_versions = upserts.select(
        # deterministic id: content-addressed (path, hash, version) — a
        # retried batch re-derives the identical version from the same
        # prev row and regenerates the identical id, so replays cannot
        # fork the version chain; version in the hash keeps a same-hash
        # re-create (after deletion) distinct from its tombstoned v1
        F.sha2(
            F.concat_ws(
                "|",
                F.col("source_path"),
                F.col("file_hash"),
                (F.coalesce(F.col("prev_version"), F.lit(0)) + 1).cast("string"),
            ),
            256,
        ).alias("doc_id"),
        "source_path",
        "file_hash",
        (F.coalesce(F.col("prev_version"), F.lit(0)) + 1).alias("version"),
        F.col("prev_doc_id").alias("parent_id"),
        F.lit(True).alias("is_current"),
        F.col("changed_at").alias("synced_at"),
    )
    new_tombstones = (
        changes.filter(F.col("change_type") == "delete")
        .join(current, "source_path", "inner")  # unknown paths: nothing to tombstone
        .filter(~F.coalesce(F.col("prev_dead"), F.lit(False)))  # already dead: no duplicate log
        .select(
            "source_path",
            F.col("prev_doc_id").alias("doc_id"),
            F.col("changed_at").alias("deleted_at"),
        )
    )
    return new_versions, new_tombstones


def demote_superseded(existing: DataFrame, new_versions: DataFrame) -> DataFrame:
    """Rewrite is_current on rows superseded by this batch.  The table
    stays append-only in spirit — versions are never removed — but the
    is_current flag is maintained like the reference's demote trigger
    (``030_extractions.sql:84-105``)."""
    superseded = new_versions.filter(F.col("parent_id").isNotNull()).select(
        F.col("parent_id").alias("doc_id")
    )
    return existing.join(F.broadcast(superseded), "doc_id", "left_semi").withColumn(
        "is_current", F.lit(False)
    ).unionByName(existing.join(F.broadcast(superseded), "doc_id", "left_anti"))


def current_documents(docs: DataFrame, tombstones: DataFrame) -> DataFrame:
    """The serving view (T8): current versions minus tombstoned VERSIONS.

    The tombstone names the exact doc_id that was deleted (as the
    reference logs deletions per document_id,
    ``043_document_source_deletions.sql``), so a file deleted and later
    re-created — whose new version carries a fresh doc_id — reappears
    here; an earlier anti-join on source_path hid re-created documents
    forever."""
    dead = tombstones.select("doc_id").distinct()
    return docs.filter(F.col("is_current")).join(dead, "doc_id", "left_anti")


class ConnectorSync:
    """Driver loop for one connector: token protocol + batched CDC.

    ``read_changes(token) -> (changes_df, next_token)`` abstracts the
    source API (SharePoint delta query / Drive changes.list).  It must
    raise :class:`TokenInvalidatedError` for a stale cursor, in which
    case the sync resets to a FULL resync (token=None) exactly like the
    reference (``google_drive/sync.py:318-330``) — correct because
    unchanged content no-ops through ``apply_change_batch``.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        connector_id: str,
        tenant_id: str = "t0",
        landing_path: str | None = None,
        landing_zorder_cols: tuple[str, ...] = (),
    ) -> None:
        self.spark = spark
        self.tokens = DeltaTokenStore(state_dir, connector_id)
        self.docs_path = os.path.join(state_dir, f"{connector_id}.docs.parquet")
        self.tombstones_path = os.path.join(state_dir, f"{connector_id}.tombstones.parquet")
        # Landing log (SURVEY §1.2): each sync's new versions append to a
        # shared parquet table partitioned by (tenant, date) — the
        # 100 TB layout where tenant-scoped and time-ranged reads prune
        # to directories.  The connector belongs to ONE tenant (the
        # reference's per-tenant connector rows), so its writes land
        # under that tenant's directory only.
        self.tenant_id = tenant_id
        self.landing_path = landing_path
        # optional within-directory Z-order for landed batches (e.g.
        # ("doc_id", "file_size") — see ingest.land_documents): footer
        # skipping on secondary columns where the data actually lands.
        # Periodic optimize_landing compaction re-clusters accumulated
        # small per-sync files the same way.
        self.landing_zorder_cols = landing_zorder_cols

    # -- state-table accessors -------------------------------------------
    def docs(self) -> DataFrame:
        if os.path.exists(self.docs_path):
            return self.spark.read.parquet(self.docs_path)
        return self.spark.createDataFrame(
            [], "doc_id string, source_path string, file_hash string, version long, "
                "parent_id string, is_current boolean, synced_at timestamp",
        )

    def tombstones(self) -> DataFrame:
        if os.path.exists(self.tombstones_path):
            return self.spark.read.parquet(self.tombstones_path)
        return self.spark.createDataFrame(
            [], "source_path string, doc_id string, deleted_at timestamp"
        )

    def current(self) -> DataFrame:
        return current_documents(self.docs(), self.tombstones())

    # -- sync ------------------------------------------------------------
    def sync_once(self, read_changes) -> dict:
        """One sync cycle; returns stats.  Token invalidation triggers
        the full-resync path in-line (reset token, re-read from None).

        A full resync enumerates what the source has NOW — files
        deleted during the stale-token gap produce no 'delete' event,
        so deletes are SYNTHESIZED for every current document whose
        source_path is absent from the enumeration (unchanged-hash
        no-ops make re-processing safe, but only reconciliation makes
        disappearance safe)."""
        token = self.tokens.load()
        full_resync = False
        try:
            changes, next_token = read_changes(token)
        except TokenInvalidatedError:
            self.tokens.reset()
            full_resync = True
            changes, next_token = read_changes(None)
            enumerated = changes.select("source_path").distinct()
            vanished = (
                self.docs()
                .filter(F.col("is_current"))
                .join(enumerated, "source_path", "left_anti")
                .select("source_path")
                .distinct()
            )
            # timestamp the synthesized deletes at the batch high-water
            # mark (deterministic from the feed); an EMPTY enumeration
            # falls back to the state's own high-water mark (max
            # synced_at of the docs being tombstoned) — never the wall
            # clock, so a retried/replayed resync stamps identical
            # tombstones.  The epoch literal is only reachable when the
            # docs table is empty too, in which case `vanished` is empty
            # and the stamp is never written.
            row = changes.agg(F.max("changed_at")).first()
            if row is not None and row[0] is not None:
                stamp = F.lit(row[0])
            else:
                from datetime import datetime

                hw = self.docs().agg(F.max("synced_at")).first()
                stamp = F.lit(
                    hw[0] if hw is not None and hw[0] is not None else datetime(1970, 1, 1)
                )
            changes = changes.unionByName(
                vanished.select(
                    "source_path",
                    F.lit("").alias("file_hash"),
                    F.lit("delete").alias("change_type"),
                    stamp.cast("timestamp").alias("changed_at"),
                )
            )

        existing = self.docs()
        new_versions, new_tombstones = apply_change_batch(changes, existing, self.tombstones())
        # BOTH outputs must be materialized BEFORE any state write: they
        # are lazy plans over the current docs parquet, and the docs
        # overwrite below deletes the files they would otherwise re-read
        # (a batch with an upsert AND a delete used to crash with
        # FILE_NOT_EXIST on the tombstone write, losing the tombstone
        # with the docs half-applied)
        new_versions = new_versions.localCheckpoint(eager=True)
        new_tombstones = new_tombstones.localCheckpoint(eager=True)

        n_new = new_versions.count()
        n_dead = new_tombstones.count()
        if n_new:
            # Landing FIRST, docs state second, token last — the crash
            # ordering that converges on retry: die after landing but
            # before the docs write and the retry recomputes the SAME
            # new_versions (docs unchanged), which the (doc_id, version)
            # anti-join below turns into a no-op re-append; die after
            # the docs write and the retry's diff is empty (n_new == 0),
            # skipping landing — the rows are already in the log.
            # Landing after the docs write had an unrecoverable window:
            # a crash between the two lost the batch from the landing
            # log forever, because the retry diffs against the
            # already-updated state and lands nothing.
            if self.landing_path is not None:
                from pyspark.errors import AnalysisException

                from car_etl_spark.operators.ingest import land_documents, read_landed

                to_land = new_versions.withColumn(
                    "tenant_id", F.lit(self.tenant_id)
                ).withColumn("ingest_date", F.to_date(F.col("synced_at")))
                try:
                    # Bounded-per-batch readback: a replayed batch lands
                    # rows with the SAME ingest_date (derived from the
                    # feed's synced_at, not the wall clock), so only
                    # partitions >= this batch's earliest date can hold
                    # its duplicates — prune the rest by directory
                    # instead of scanning the tenant's full landing
                    # history every sync.  new_versions is already
                    # checkpointed, so the min() is a bounded local job.
                    min_date = to_land.agg(F.min("ingest_date")).first()[0]
                    already = read_landed(
                        new_versions.sparkSession,
                        self.landing_path,
                        tenant_id=self.tenant_id,
                        since_date=min_date,
                    ).select("doc_id", "version")
                    to_land = to_land.join(already, ["doc_id", "version"], "left_anti")
                except AnalysisException:
                    pass  # first batch: nothing landed yet
                # materialize before the append: the anti-join plan READS
                # the landing log the write is about to extend
                # num_files bounded low: a sync batch is small, and the
                # periodic optimize_landing pass owns the final layout
                land_documents(
                    to_land.localCheckpoint(eager=True),
                    self.landing_path,
                    zorder_cols=self.landing_zorder_cols,
                    num_files=4,
                )
            updated = demote_superseded(existing, new_versions).unionByName(new_versions)
            updated.localCheckpoint(eager=True).write.mode("overwrite").parquet(self.docs_path)
        if n_dead:
            new_tombstones.write.mode("append").parquet(self.tombstones_path)
        self.tokens.save(next_token)
        return {"new_versions": n_new, "tombstones": n_dead, "full_resync": full_resync}
