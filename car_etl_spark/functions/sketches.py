"""Portable distinct-count sketches: HyperLogLog + KMV, Spark/DuckDB twins.

At 100 TB, ``COUNT(DISTINCT x)`` per group is the classic scale trap:
Spark rewrites it into an expand + two-phase aggregate whose state is
the distinct set itself — per-group memory grows with cardinality and
the shuffle carries every distinct value.  The sketch alternative
carries FIXED per-group state (2^p registers for HLL, k hashes for KMV)
with full map-side combine, so the shuffle is bounded by
``groups x m`` regardless of data volume — the standard practice of
Flajolet et al. (HyperLogLog, AofA 2007) and Bar-Yossef et al. (KMV /
"distinct elements in a data stream", RANDOM 2002).

Like ``operators/portable.py`` (whose 60-bit md5 ``h0`` this module
reuses), every arithmetic step here is chosen so Spark and DuckDB
produce BIT-IDENTICAL estimates, which is what lets the sketch columns
ride inside an oracle-checked registry row rather than being "close
enough" approximations:

- **register sums are integers**: instead of the paper's
  ``sum(2^-M_j)`` (a float whose accumulation order differs between
  engines), we sum ``2^(Lmax - M_j)`` — exact BIGINT terms, max
  ``m * 2^(Lmax)`` = 2^61 < 2^63 for every precision p (Lmax = 61-p).
- **rho (leading-zero rank) is integer-only**: ``log2`` at exact powers
  of two is a cross-engine landmine, so rho = Lmax - bit_length(w) with
  bit_length computed by bit-smearing (w |= w>>1 ... w>>32) +
  ``bit_count`` — six shifts, one popcount, both engines exact.
- **one float division at the end**: ``E = C / S`` with C a shared
  Python-derived literal (repr round-trips to the same double in both
  parsers) and S the identical BIGINT — IEEE division is deterministic.
- **no ln() at runtime**: the small-range (linear-counting) correction
  ``m * ln(m/V)`` depends only on V in 1..m, so the full table is
  precomputed in Python and embedded as literals on BOTH sides —
  libm-vs-JVM last-ulp drift never enters.
- **the correction branch is taken identically**: the branch condition
  compares the identical E_raw against a shared literal threshold.

Spark's built-in ``approx_count_distinct`` (HLL++) remains the
JVM-native default when only Spark consumes the number (one intrinsic,
no portability contract) — the same split as the xxhash64-vs-portable
LSH families: built-in for the hot path, this module when the estimate
must be reproducible outside the engine (audits, oracle checks,
cross-stack incremental reruns); its 3-sigma agreement with the exact
form is pinned separately in ``test_approx_count_distinct_within_budget``.

Reference behavior covered: the analytics distinct-count surface of
the reference's append-only audit event rows
(``src/audit/logger.py``, ``supabase/migrations/012_audit_logs.sql`` —
per-tenant distinct actors & documents),
re-expressed with the estimator a 100 TB deployment actually runs.
Mergeability (register max / hash-set union) is what makes the sketch a
valid pre-aggregate for rollup cubes; pinned by tests.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from car_etl_spark.operators.portable import H0_SQL, h0

HLL_P_DEFAULT = 9
KMV_K_DEFAULT = 256
_TWO60 = float(2**60)
_SMEAR_SHIFTS = (1, 2, 4, 8, 16, 32)


def _hll_consts(p: int) -> tuple[int, int, int, float, list[float]]:
    """(m, L, lmax, C, lc_table) for precision ``p`` — the ONE
    derivation both the Spark expressions and the SQL generator read.
    ``C = alpha_m * m^2 * 2^lmax`` folds the integer register-sum
    scaling into the numerator; ``lc_table[V-1] = m * ln(m/V)`` is the
    linear-counting correction for V empty registers."""
    if not 4 <= p <= 14:
        raise ValueError(f"HLL precision must be in [4, 14], got {p}")
    m = 1 << p
    L = 60 - p  # sub-bucket bits of the 60-bit portable hash
    lmax = L + 1  # rho range is 1..lmax; empty registers hold 0
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    c = alpha * float(m) * float(m) * float(2**lmax)
    lc = [m * math.log(m / v) for v in range(1, m + 1)]
    return m, L, lmax, c, lc


def _smear(col: Column) -> Column:
    """Propagate the leading 1-bit rightward so bit_count == bit_length."""
    s = col
    for sh in _SMEAR_SHIFTS:
        s = s.bitwiseOR(F.shiftrightunsigned(s, sh))
    return s


def hll_registers(
    df: DataFrame, keys: list[str], value: Column, p: int = HLL_P_DEFAULT
) -> DataFrame:
    """The mergeable HLL state: one (keys..., __bucket, __M) row per
    non-empty register.  Merging shards = unionByName + groupBy max —
    the property that makes this a legal partial aggregate (pinned in
    ``tests/test_sketches.py``).  At scale this is the whole sketch:
    a map-side-combining groupBy on (keys, bucket) whose result is at
    most ``groups * m`` rows."""
    _m, L, lmax, _c, _lc = _hll_consts(p)
    h = h0(value)
    bucket = F.shiftrightunsigned(h, L).alias("__bucket")
    w = h.bitwiseAND(F.lit((1 << L) - 1))
    rho = (F.lit(lmax) - F.bit_count(_smear(w))).alias("__rho")
    return (
        df.select(*keys, bucket, rho)
        .groupBy(*keys, "__bucket")
        .agg(F.max("__rho").alias("__M"))
    )


def hll_merge(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge register frames from independent shards (register-wise max)."""
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out.groupBy(*keys, "__bucket").agg(F.max("__M").alias("__M"))


def hll_estimate(
    registers: DataFrame,
    keys: list[str],
    p: int = HLL_P_DEFAULT,
    alias: str = "hll_distinct",
) -> DataFrame:
    """(keys..., <alias> BIGINT) from a register frame — raw HLL
    estimator with the linear-counting small-range correction, all
    arithmetic cross-engine exact (module docstring)."""
    m, _L, lmax, c, lc = _hll_consts(p)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {lmax} - __M)")
    agg = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__present"), F.sum(term).alias("__sp")
    )
    v = F.lit(m) - F.col("__present")
    s = F.col("__sp") + v * F.lit(1 << lmax)
    e_raw = F.lit(c) / s.cast("double")
    lc_arr = F.array(*[F.lit(x) for x in lc])
    corrected = F.element_at(lc_arr, F.greatest(v, F.lit(1)).cast("int"))
    e = F.when((v > 0) & (e_raw <= F.lit(2.5 * m)), corrected).otherwise(e_raw)
    return agg.select(
        *keys, F.floor(e + F.lit(0.5)).cast("long").alias(alias)
    )


def hll_distinct(
    df: DataFrame,
    keys: list[str],
    value: Column,
    p: int = HLL_P_DEFAULT,
    alias: str = "hll_distinct",
) -> DataFrame:
    """Per-group distinct-count estimate in one call (registers +
    estimate).  ``value`` must be a STRING column/expression — the
    portable hash is bytes-defined over UTF-8."""
    return hll_estimate(hll_registers(df, keys, value, p), keys, p, alias)


def kmv_state(
    df: DataFrame, keys: list[str], value: Column, k: int = KMV_K_DEFAULT
) -> DataFrame:
    """The mergeable KMV state: the k smallest distinct portable hashes
    per group, as (keys..., __h) rows.  The global k smallest hashes of
    a union are a subset of the union of per-shard k smallest — so
    merging shards is union + re-take-k (:func:`kmv_merge`), which is
    what makes KMV a legal partial aggregate and gives it set-operation
    estimates (union cardinality via merged states) that HLL's
    register-max can't express as naturally."""
    if k < 2:
        raise ValueError(f"KMV needs k >= 2, got {k}")
    dh = df.select(*keys, h0(value).alias("__h")).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    return (
        dh.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(parts: list[DataFrame], keys: list[str], k: int = KMV_K_DEFAULT) -> DataFrame:
    """Merge per-shard KMV states: distinct-union the hash sets, re-take
    the k smallest per group."""
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    w = Window.partitionBy(*keys).orderBy("__h")
    return (
        out.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(
    state: DataFrame,
    keys: list[str],
    k: int = KMV_K_DEFAULT,
    alias: str = "kmv_distinct",
) -> DataFrame:
    """(keys..., <alias> BIGINT) from a KMV state frame: (k-1) / u_(k)
    with u the k-th smallest normalized hash; exact count when a group
    holds fewer than k distinct hashes."""
    agg = state.groupBy(*keys).agg(
        F.max("__h").alias("__kth"), F.count(F.lit(1)).alias("__cnt")
    )
    est = F.when(F.col("__cnt") < k, F.col("__cnt")).otherwise(
        F.floor(
            F.lit(float(k - 1) * _TWO60) / F.col("__kth").cast("double") + F.lit(0.5)
        ).cast("long")
    )
    return agg.select(*keys, est.alias(alias))


def kmv_distinct(
    df: DataFrame,
    keys: list[str],
    value: Column,
    k: int = KMV_K_DEFAULT,
    alias: str = "kmv_distinct",
) -> DataFrame:
    """Per-group K-minimum-values distinct estimate in one call.  Scale
    note: the rank filter sorts distinct hashes per key (one shuffle +
    per-key sort) — fine when per-group cardinality is bounded; for
    unbounded groups prefer :func:`hll_distinct`, whose state is fixed
    at m registers.  KMV earns its place as the independent cross-check
    estimator (different estimator family, same portable hash)."""
    return kmv_estimate(kmv_state(df, keys, value, k), keys, k, alias)


# ---------------------------------------------------------------------------
# Count-min frequency sketch (heavy-hitter / point-frequency estimates)
# ---------------------------------------------------------------------------
# Cormode & Muthukrishnan (J. Algorithms 2005): d hash rows x w counters;
# est(x) = min_i counter[i][h_i(x)] — never under-counts, over-counts by
# <= (e/w)·N with probability >= 1 - e^-d.  Counters are ADDITIVE, so the
# state is a legal partial aggregate (shard merge = counter sum) with
# per-group size fixed at d·w regardless of item cardinality — the
# frequency member of the family (distinct -> HLL/KMV, quantiles ->
# histogram, frequencies -> CMS).  Portability: the row hashes are the
# same pairwise-independent affine family over the portable 60-bit hash
# the LSH stack uses (operators/portable.py), all arithmetic integer, so
# Spark and DuckDB produce BIT-IDENTICAL counters and estimates; probe
# keys are precomputed driver-side with h0_py and injected as literals
# into both engines (a point lookup hashes nothing in-engine).

CMS_D_DEFAULT = 4
CMS_W_DEFAULT = 1024


def _cms_consts(d: int, w: int) -> tuple[list[int], list[int]]:
    from car_etl_spark.operators.portable import affine_consts

    if d < 1 or w < 2:
        raise ValueError(f"CMS needs d >= 1 and w >= 2, got d={d}, w={w}")
    return affine_consts(d)


def cms_state(
    df: DataFrame,
    keys: list[str],
    value: Column,
    d: int = CMS_D_DEFAULT,
    w: int = CMS_W_DEFAULT,
) -> DataFrame:
    """The mergeable CMS state: (keys..., __r, __c, __n) — one row per
    non-empty counter (absent counter == 0).  Explode-then-aggregate
    (never per-row HOF arrays): the d (row, col) pairs stage through a
    projected array, and the groupBy count combines map-side, so the
    shuffle carries at most ``groups x d x w`` counter rows."""
    from car_etl_spark.operators.portable import MOD31, MOD32, h0

    a, b = _cms_consts(d, w)
    staged = df.select(*keys, (h0(value) % F.lit(MOD31)).alias("__hm"))
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                (
                    (F.lit(a[i]) * F.col("__hm") + F.lit(b[i])) % F.lit(MOD32)
                    % F.lit(w)
                ).alias("c"),
            )
            for i in range(d)
        ]
    )
    return (
        staged.select(*keys, F.explode(pairs).alias("__p"))
        .select(*keys, F.col("__p.r").alias("__r"), F.col("__p.c").alias("__c"))
        .groupBy(*keys, "__r", "__c")
        .agg(F.count(F.lit(1)).alias("__n"))
    )


def cms_merge(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge per-shard CMS states: counter-wise SUM (the additive
    algebra that makes CMS a legal pre-aggregate for rollups)."""
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out.groupBy(*keys, "__r", "__c").agg(F.sum("__n").alias("__n"))


def cms_probe_rows(
    items: list[str], d: int = CMS_D_DEFAULT, w: int = CMS_W_DEFAULT
) -> list[tuple[str, int, int]]:
    """Driver-side probe precomputation: (item, row, col) literals via
    the Python twin of the portable hash — injected identically into
    the Spark plan and the SQL twin, so a point lookup never hashes
    in-engine."""
    from car_etl_spark.operators.portable import MOD31, MOD32, h0_py

    a, b = _cms_consts(d, w)
    out = []
    for it in items:
        hm = h0_py(it) % MOD31
        for i in range(d):
            out.append((it, i, (a[i] * hm + b[i]) % MOD32 % w))
    return out


def cms_estimate(
    state: DataFrame,
    keys: list[str],
    items: list[str],
    d: int = CMS_D_DEFAULT,
    w: int = CMS_W_DEFAULT,
    alias: str = "cms_freq",
    item_alias: str = "item",
) -> DataFrame:
    """(keys..., <item_alias>, <alias> BIGINT): min over the d probed
    counters, absent counters counting 0.

    Scale shape: the only broadcast is the |items|·d probe (r, c) pair
    set — the full state is NEVER broadcast (it is bounded per group,
    but grows linearly with group count).  The state first semi-joins
    down to the probed counters (≤ groups·|items|·d rows), then the
    probes outer-join that small remainder; per (group, item) exactly
    d rows feed the min, so estimate cost is independent of data
    volume and safe at any group cardinality."""
    spark = state.sparkSession
    probes = spark.createDataFrame(
        cms_probe_rows(items, d, w), f"{item_alias} string, __r int, __c long"
    )
    hit = state.join(
        F.broadcast(probes.select("__r", "__c").distinct()), ["__r", "__c"], "leftsemi"
    )
    if keys:
        probes = state.select(*keys).distinct().crossJoin(F.broadcast(probes))
    joined = probes.join(hit, [*keys, "__r", "__c"], "left")
    return (
        joined.groupBy(*keys, item_alias)
        .agg(F.min(F.coalesce(F.col("__n"), F.lit(0))).alias(alias))
    )


def cms_sql_ctes(
    source: str,
    keys: list[str],
    expr: str,
    items: list[str],
    d: int = CMS_D_DEFAULT,
    w: int = CMS_W_DEFAULT,
    alias: str = "cms_freq",
    item_alias: str = "item",
    prefix: str = "cq",
) -> str:
    """CTE chain ending in ``{prefix}_out(keys..., item, alias)`` — the
    DuckDB twin of :func:`cms_state` + :func:`cms_estimate`, same affine
    constants, same precomputed probe literals."""
    from car_etl_spark.operators.portable import H0_SQL, MOD31, MOD32

    a, b = _cms_consts(d, w)
    ks = ", ".join(keys)
    ks_pre = (ks + ", ") if keys else ""
    pre = f"{prefix}_"
    fam = ", ".join(f"({i}, {a[i]}, {b[i]})" for i in range(d))
    # SQL string literals: double embedded quotes so any probe value
    # (e.g. "o'brien") generates parseable VALUES rows
    probes = ", ".join(
        "('{}', {}, {})".format(it.replace("'", "''"), r, c)
        for it, r, c in cms_probe_rows(items, d, w)
    )
    key_join = f"CROSS JOIN (SELECT DISTINCT {ks} FROM {source})" if keys else ""
    on_keys = " AND ".join(f"s.{k} = p.{k}" for k in keys)
    on = (on_keys + " AND " if keys else "") + "s.r = p.r AND s.c = p.c"
    sel_keys = ", ".join(f"p.{k}" for k in keys)
    sel_pre = (sel_keys + ", ") if keys else ""
    return f"""{pre}h AS MATERIALIZED (
  SELECT {ks_pre}{H0_SQL.format(expr=expr)} % {MOD31} AS hm FROM {source}
), {pre}state AS MATERIALIZED (
  SELECT {ks_pre}fam.i AS r, (fam.a * hm + fam.b) % {MOD32} % {w} AS c, COUNT(*) AS n
  FROM {pre}h, (VALUES {fam}) fam(i, a, b)
  GROUP BY {ks_pre}fam.i, (fam.a * hm + fam.b) % {MOD32} % {w}
), {pre}probe AS (
  SELECT * FROM (VALUES {probes}) pr({item_alias}, r, c) {key_join}
), {pre}out AS (
  SELECT {sel_pre}p.{item_alias}, MIN(COALESCE(s.n, 0)) AS {alias}
  FROM {pre}probe p LEFT JOIN {pre}state s ON {on}
  GROUP BY {sel_pre}p.{item_alias}
)"""


# ---------------------------------------------------------------------------
# Equi-width histogram quantiles (bounded-state percentile sketch)


def histogram_frame(df: DataFrame, keys: list[str], value: Column) -> DataFrame:
    """The per-group (lo, hi) bin frame.  For incremental/sharded use,
    compute it ONCE and pass it to every :func:`histogram_state` call —
    the frozen-quantizer discipline (same as the IVF store's frozen
    centroids): shard states only merge exactly when they binned
    against the same frame.  Values outside a frozen frame clamp to the
    edge bins, which keeps counts valid (quantile error stays bounded
    by the clamped mass)."""
    v = value.cast("double")
    return df.groupBy(*keys).agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))


def histogram_state(
    df: DataFrame,
    keys: list[str],
    value: Column,
    bins: int = 64,
    frame: DataFrame | None = None,
) -> DataFrame:
    """The mergeable quantile-sketch state: per-group (lo, hi, bin,
    cnt) rows — at most ``bins`` counters per group, map-side combined,
    merged across shards by adding counts (:func:`histogram_merge`,
    valid when shards were built against one shared ``frame``).  Exact
    percentiles sort every group's values; this is the fixed-memory
    alternative whose error is bounded by one bin width of the value
    range.

    Cross-engine exactness: the bin index is
    ``least(floor((v - lo) / (hi - lo) * bins), bins - 1)`` — identical
    IEEE doubles in, identical bin out; counts are integers from there.
    """
    if bins < 2:
        raise ValueError(f"histogram needs bins >= 2, got {bins}")
    v = value.cast("double")
    mm = frame if frame is not None else histogram_frame(df, keys, value)
    src = df.select(*keys, v.alias("__v")).join(F.broadcast(mm), keys)
    width_pos = F.col("__hi") > F.col("__lo")
    b = F.when(
        width_pos,
        F.greatest(
            F.least(
                F.floor(
                    (F.col("__v") - F.col("__lo"))
                    / (F.col("__hi") - F.col("__lo"))
                    * F.lit(bins)
                ),
                F.lit(bins - 1).cast("long"),
            ),
            F.lit(0).cast("long"),
        ),
    ).otherwise(F.lit(0).cast("long"))
    return (
        src.groupBy(*keys, "__lo", "__hi", b.alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def histogram_merge(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge shard states sharing a (lo, hi) frame: counts add."""
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out.groupBy(*keys, "__lo", "__hi", "__bin").agg(
        F.sum("__cnt").alias("__cnt")
    )


def histogram_quantiles(
    state: DataFrame, keys: list[str], quantiles: list[tuple[float, str]], bins: int = 64
) -> DataFrame:
    """(keys..., <alias> ...) estimates from a histogram state: find the
    bin whose cumulative count crosses ``q*n``, linear-interpolate
    within it.  Every float step (q*n target, crossing test, the
    interpolation ``lo + (bin + frac) * (hi - lo) / bins``) is the same
    IEEE expression the SQL twin evaluates, so estimates are
    cross-engine bit-identical."""
    w = Window.partitionBy(*keys).orderBy("__bin")
    cum = state.select(
        *keys, "__lo", "__hi", "__bin", "__cnt",
        F.sum("__cnt").over(w).alias("__cum"),
        F.sum("__cnt").over(Window.partitionBy(*keys)).alias("__n"),
    )
    aggs = []
    for q, alias in quantiles:
        t = F.lit(q) * F.col("__n").cast("double")
        crossing = (F.col("__cum").cast("double") >= t) & (
            (F.col("__cum") - F.col("__cnt")).cast("double") < t
        )
        frac = (t - (F.col("__cum") - F.col("__cnt")).cast("double")) / F.col(
            "__cnt"
        ).cast("double")
        est = F.col("__lo") + (F.col("__bin").cast("double") + frac) * (
            F.col("__hi") - F.col("__lo")
        ) / F.lit(float(bins))
        aggs.append(
            F.max(F.when(crossing, F.floor(est * 1e6 + F.lit(0.5)) / 1e6)).alias(alias)
        )
    return cum.groupBy(*keys).agg(*aggs)


def histogram_quantile_estimates(
    df: DataFrame,
    keys: list[str],
    value: Column,
    quantiles: list[tuple[float, str]],
    bins: int = 64,
) -> DataFrame:
    """One-call form: state + estimates."""
    return histogram_quantiles(
        histogram_state(df, keys, value, bins), keys, quantiles, bins
    )


def histogram_quantiles_sql_ctes(
    source: str,
    keys: list[str],
    expr: str,
    quantiles: list[tuple[float, str]],
    bins: int = 64,
    prefix: str = "qq",
) -> str:
    """CTE chain ending in ``{prefix}_out`` — DuckDB twin of
    :func:`histogram_quantile_estimates`, same formulas verbatim."""
    if bins < 2:
        raise ValueError(f"histogram needs bins >= 2, got {bins}")
    ks = ", ".join(keys)
    pre = f"{prefix}_"
    jk = " AND ".join(f"{pre}mm.{k} = s.{k}" for k in keys)
    sks = ", ".join(f"s.{k}" for k in keys)
    est_cols = []
    for q, alias in quantiles:
        t = f"({q!r} * CAST(n AS DOUBLE))"
        frac = f"(({t} - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE))"
        est = f"(lo + (CAST(bin AS DOUBLE) + {frac}) * (hi - lo) / {float(bins)!r})"
        est_cols.append(
            f"MAX(CASE WHEN CAST(cum AS DOUBLE) >= {t} AND CAST(cum - cnt AS DOUBLE) < {t} "
            f"THEN FLOOR({est} * 1e6 + 0.5) / 1e6 END) AS {alias}"
        )
    return f"""{pre}mm AS MATERIALIZED (
  SELECT {ks}, MIN(CAST({expr} AS DOUBLE)) AS lo, MAX(CAST({expr} AS DOUBLE)) AS hi
  FROM {source} GROUP BY {ks}
), {pre}hist AS MATERIALIZED (
  SELECT {sks}, lo, hi,
         CASE WHEN hi > lo
              THEN GREATEST(LEAST(CAST(FLOOR((CAST({expr} AS DOUBLE) - lo) / (hi - lo) * {bins}) AS BIGINT),
                                  {bins - 1}), 0)
              ELSE 0 END AS bin,
         COUNT(*) AS cnt
  FROM {source} s JOIN {pre}mm ON {jk}
  GROUP BY {sks}, lo, hi, bin
), {pre}cum AS MATERIALIZED (
  SELECT {ks}, lo, hi, bin, cnt,
         SUM(cnt) OVER (PARTITION BY {ks} ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY {ks}) AS n
  FROM {pre}hist
), {pre}out AS (
  SELECT {ks}, {", ".join(est_cols)}
  FROM {pre}cum GROUP BY {ks}
)"""


# ---------------------------------------------------------------------------
# SQL twins (DuckDB) — same constants, same integer discipline


def _smear_stages_sql(prefix: str, keys_sql: str, carry: str) -> str:
    """The six shift-or stages as chained CTEs (nesting the expression
    would square its text per stage).  ``carry`` = extra columns to
    thread through (e.g. ``bucket``)."""
    stages = []
    prev = f"{prefix}w"
    for i, sh in enumerate(_SMEAR_SHIFTS):
        name = f"{prefix}s{i}"
        stages.append(
            f"{name} AS (SELECT {keys_sql}, {carry}, (w | (w >> {sh})) AS w FROM {prev})"
        )
        prev = name
    return ", ".join(stages)


def hll_sql_ctes(
    source: str,
    keys: list[str],
    expr: str,
    p: int = HLL_P_DEFAULT,
    alias: str = "hll_distinct",
    prefix: str = "hq",
) -> str:
    """CTE chain ending in ``{prefix}_out(keys..., alias)`` — the DuckDB
    twin of :func:`hll_distinct` over an existing CTE/table ``source``.
    Constants come from the same ``_hll_consts`` call as the Spark side."""
    m, L, lmax, c, lc = _hll_consts(p)
    ks = ", ".join(keys)
    pre = f"{prefix}_"
    lc_list = ", ".join(repr(x) for x in lc)
    e_raw = f"({c!r} / CAST(S AS DOUBLE))"
    return f"""{pre}h AS MATERIALIZED (
  SELECT {ks}, {H0_SQL.format(expr=expr)} AS h FROM {source}
), {pre}w AS (
  SELECT {ks}, (h >> {L}) AS bucket, (h & {(1 << L) - 1}) AS w FROM {pre}h
), {_smear_stages_sql(pre, ks, "bucket")}, {pre}reg AS MATERIALIZED (
  SELECT {ks}, bucket, MAX({lmax} - bit_count(w)) AS M
  FROM {pre}s{len(_SMEAR_SHIFTS) - 1} GROUP BY {ks}, bucket
), {pre}agg AS (
  SELECT {ks}, COUNT(*) AS present, SUM(1::BIGINT << ({lmax} - M)) AS sp
  FROM {pre}reg GROUP BY {ks}
), {pre}sv AS (
  SELECT {ks}, ({m} - present) AS V, sp + ({m} - present) * {1 << lmax}::BIGINT AS S
  FROM {pre}agg
), {pre}out AS (
  SELECT {ks},
         CAST(FLOOR(CASE WHEN V > 0 AND {e_raw} <= {2.5 * m!r}
                         THEN ([{lc_list}])[GREATEST(V, 1)]
                         ELSE {e_raw} END + 0.5) AS BIGINT) AS {alias}
  FROM {pre}sv
)"""


def kmv_sql_ctes(
    source: str,
    keys: list[str],
    expr: str,
    k: int = KMV_K_DEFAULT,
    alias: str = "kmv_distinct",
    prefix: str = "kq",
) -> str:
    """CTE chain ending in ``{prefix}_out`` — DuckDB twin of
    :func:`kmv_distinct`."""
    if k < 2:
        raise ValueError(f"KMV needs k >= 2, got {k}")
    ks = ", ".join(keys)
    pre = f"{prefix}_"
    num = repr(float(k - 1) * _TWO60)
    return f"""{pre}h AS MATERIALIZED (
  SELECT DISTINCT {ks}, {H0_SQL.format(expr=expr)} AS h FROM {source}
), {pre}rk AS MATERIALIZED (
  SELECT {ks}, h, row_number() OVER (PARTITION BY {ks} ORDER BY h) AS rn FROM {pre}h
), {pre}agg AS (
  SELECT {ks}, MAX(h) AS kth, COUNT(*) AS cnt FROM {pre}rk WHERE rn <= {k}
  GROUP BY {ks}
), {pre}out AS (
  SELECT {ks},
         CASE WHEN cnt < {k} THEN cnt
              ELSE CAST(FLOOR({num} / CAST(kth AS DOUBLE) + 0.5) AS BIGINT) END AS {alias}
  FROM {pre}agg
)"""
