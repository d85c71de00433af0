"""Feature-flag broadcast config (SURVEY §1.1).

The reference evaluates flags per tenant with a TTL cache over two
control-plane tables (``src/features/service.py:12-128``): a flag
catalog with a default (``feature_flags.enabled_default``) and
per-tenant overrides (``tenant_feature_flags.enabled``), failing CLOSED
(missing flag or lookup error -> disabled) with a 5-minute shared TTL
cache and per-flag/per-tenant invalidation.

Spark mapping: the flag tables are control plane — tiny, slowly
changing — so the effective per-tenant resolution is computed ONCE on
the driver and shipped to every executor as a broadcast variable; a
TTL re-broadcast plays the cache-expiry role.  Two consumption shapes:

- **Driver-side gating** (``is_enabled``): plan-construction decisions
  ("include this operator in the pipeline?"), the analog of the
  reference's service call sites.
- **Row-level gating** (``gate``): filter a fact frame to tenants with
  a flag on — a broadcast hash join against the resolved table, never a
  shuffle of the fact side.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: reference CACHE_TTL_SECONDS (service.py:12)
DEFAULT_TTL_SECONDS = 300.0

#: expected schemas (control-plane contract)
FLAGS_SCHEMA = "flag_name string, enabled_default boolean"
OVERRIDES_SCHEMA = "tenant_id string, flag_name string, enabled boolean"


def resolve_effective_flags(flags: DataFrame, overrides: DataFrame) -> DataFrame:
    """(tenant_id, flag_name, enabled) for every override plus the
    default row per flag (tenant_id NULL = catalog default).  Override
    beats default, like the reference's two-step lookup
    (``service.py:104-120``)."""
    defaults = flags.select(
        F.lit(None).cast("string").alias("tenant_id"),
        "flag_name",
        F.col("enabled_default").alias("enabled"),
    )
    specific = overrides.join(
        flags.select("flag_name"), "flag_name", "left_semi"  # unknown flags fail closed
    ).select("tenant_id", "flag_name", "enabled")
    return specific.unionByName(defaults)


class FeatureFlags:
    """TTL-refreshed broadcast of the resolved flag map.

    ``loader`` returns the two control-plane frames on demand (in
    production: a JDBC/Delta read of the flag tables).  The resolved
    {(tenant_id, flag_name): enabled} dict — overrides plus per-flag
    defaults under tenant ``None`` — is broadcast; after ``ttl_seconds``
    the next read reloads and re-broadcasts, so executors converge on
    flag changes within one TTL, matching the reference's cache window.
    """

    def __init__(
        self,
        spark: SparkSession,
        loader: Callable[[], tuple[DataFrame, DataFrame]],
        ttl_seconds: float = DEFAULT_TTL_SECONDS,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self._spark = spark
        self._loader = loader
        self._ttl = ttl_seconds
        self._clock = clock
        self._bc = None
        self._map: dict | None = None
        self._loaded_at = float("-inf")

    # -- snapshot lifecycle ------------------------------------------------
    def _refresh(self) -> None:
        flags, overrides = self._loader()
        resolved = resolve_effective_flags(flags, overrides)
        self._map = {
            (r.tenant_id, r.flag_name): bool(r.enabled) for r in resolved.collect()
        }
        self._loaded_at = self._clock()
        if self._bc is not None:  # executor copies of the stale map
            self._bc.unpersist()
            self._bc = None

    def _mapping(self) -> dict:
        if getattr(self, "_map", None) is None or self._clock() - self._loaded_at >= self._ttl:
            self._refresh()
        return self._map

    def snapshot(self):
        """An executor-shippable broadcast handle over the current map,
        for closures (pandas_udf / mapPartitions) that look flags up
        executor-side — created LAZILY on first request: the driver-side
        consumers (:meth:`is_enabled`, :meth:`gate`) never pay the
        broadcast round-trip."""
        m = self._mapping()
        if self._bc is None:
            self._bc = self._spark.sparkContext.broadcast(m)
        return self._bc

    def invalidate(self) -> None:
        """Force the next read to reload (the reference's explicit
        cache invalidation on flag update, ``service.py:49-66``)."""
        self._loaded_at = float("-inf")

    # -- consumption -------------------------------------------------------
    def is_enabled(self, tenant_id: str, flag_name: str) -> bool:
        """Tenant override if present, else the flag default, else False
        (fail closed — unknown flags and load errors disable)."""
        try:
            m = self._mapping()
        except Exception:
            return False  # fail closed like the reference (service.py:125-128)
        override = m.get((tenant_id, flag_name))
        if override is not None:
            return override
        return m.get((None, flag_name), False)

    def gate(self, df: DataFrame, flag_name: str, tenant_col: str = "tenant_id") -> DataFrame:
        """Keep only rows whose tenant has ``flag_name`` enabled.

        Built as a broadcast join against the (tiny) enabled-tenant
        frame derived from the current snapshot — the fact side never
        shuffles, so this composes into any pipeline for free at scale.
        Tenants without an override follow the flag default.  Joined
        columns use reserved ``__ff_`` names so a fact frame carrying
        its own ``enabled`` column is neither ambiguous nor dropped.
        Fails CLOSED like :meth:`is_enabled`: if the control-plane
        reload errors, no rows pass (flag treated as disabled
        everywhere) rather than killing the pipeline job.  Rows with a
        NULL tenant also fail closed — an unattributable row can never
        match an override (NULL equality), and letting it ride a
        default-on flag would pass data no tenant owns through a
        tenant-gated pipeline; consistent with the module's fail-closed
        stance everywhere else.
        """
        try:
            m = self._mapping()
        except Exception:
            return df.filter(F.lit(False))  # fail closed (service.py:125-128)
        default_on = m.get((None, flag_name), False)
        overridden = [
            (t, on) for (t, f), on in m.items() if f == flag_name and t is not None
        ]
        decided = self._spark.createDataFrame(
            overridden or [], "__ff_tenant string, __ff_enabled boolean"
        )
        fact = df.join(
            F.broadcast(decided),
            F.col(tenant_col) == F.col("__ff_tenant"),
            "left",
        )
        keep = F.col(tenant_col).isNotNull() & F.coalesce(
            F.col("__ff_enabled"), F.lit(default_on)
        )
        return fact.filter(keep).drop("__ff_tenant", "__ff_enabled")
