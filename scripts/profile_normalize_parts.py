"""Component attribution for the normalize_roundtrips r12 regression
candidates: times (a) the date-normalizer chain old (9 group extracts +
concat + ISO reparse) vs new (3 group-0 extracts + per-format
try_to_date), (b) currency strip via regexp_replace vs translate, and
(c) the suite-shaped union with vs without per-leg sorts.  Noop sink,
interleaved passes, medians."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from car_etl_spark.functions import normalizers as N
from car_etl_spark.tables import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def _raw_dates():
    orders = load_tables(spark, SF_DIR, ("orders",))["orders"]
    d = F.col("o_orderdate")
    raw = (
        F.when(F.col("o_orderkey") % 5 == 0, F.date_format(d, "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 5 == 1, F.date_format(d, "M/d/yyyy"))
        .when(F.col("o_orderkey") % 5 == 2, F.date_format(d, "yyyy/MM/dd"))
        .when(F.col("o_orderkey") % 5 == 3, F.date_format(d, "MM-dd-yyyy"))
        .otherwise(F.lit("none"))
    )
    return orders.select("o_orderkey", raw.alias("raw_value"))


def _old_normalize_date(c):
    v = N._null_words_to_null(c)

    def _build(pat, y, m, d):
        year = F.regexp_extract(v, pat, y)
        month = F.regexp_extract(v, pat, m)
        day = F.regexp_extract(v, pat, d)
        cand = F.when(year != "", F.concat_ws("-", year, month, day))
        return F.try_to_date(cand, "y-M-d")

    iso = F.try_to_date(F.when(v.rlike(r"^\d{4}-\d{2}-\d{2}$"), v), "yyyy-MM-dd")
    mdy_slash = _build(r"^(\d{1,2})/(\d{1,2})/(\d{4})", 3, 1, 2)
    mdy_dash = _build(r"^(\d{2})-(\d{2})-(\d{4})", 3, 1, 2)
    ymd_slash = _build(r"^(\d{4})/(\d{2})/(\d{2})", 1, 2, 3)
    return F.coalesce(iso, mdy_dash, mdy_slash, ymd_slash)


def date_old():
    raw = _raw_dates()
    return raw.select(
        "o_orderkey",
        F.date_format(_old_normalize_date(F.col("raw_value")), "yyyy-MM-dd").alias("n"),
    )


def date_new():
    raw = _raw_dates()
    return raw.select("o_orderkey", N.normalize_date_str(F.col("raw_value")).alias("n"))


def _raw_currency():
    orders = load_tables(spark, SF_DIR, ("orders",))["orders"]
    s = F.round("o_totalprice", 2).cast("string")
    raw = (
        F.when(F.col("o_orderkey") % 4 == 0, F.concat(F.lit("$"), s))
        .when(F.col("o_orderkey") % 4 == 1, F.concat(F.lit("("), s, F.lit(")")))
        .when(F.col("o_orderkey") % 4 == 2, F.concat(F.lit("  $ "), s, F.lit(" ")))
        .otherwise(F.lit("n/a"))
    )
    return orders.select("o_orderkey", raw.alias("raw_value"))


def _cur_tail(cleaned):
    signed = F.when(
        cleaned.startswith("(") & cleaned.endswith(")"),
        F.concat(F.lit("-"), cleaned.substr(F.lit(2), F.length(cleaned) - 2)),
    ).otherwise(cleaned)
    return F.trim(signed).try_cast("double")


def currency_old():
    raw = _raw_currency()
    v = N._null_words_to_null(F.col("raw_value"))
    return raw.select(
        "o_orderkey", _cur_tail(F.regexp_replace(v, r"[$,\s]", "")).alias("n")
    )


def currency_new():
    raw = _raw_currency()
    return raw.select(
        "o_orderkey", N.normalize_currency(F.col("raw_value")).alias("n")
    )


def suite_new():
    from car_etl_spark.queries.normalize import normalize_roundtrips

    return normalize_roundtrips(spark, SF_DIR)


def suite_sorted_legs():
    # reconstruct the r11 shape: same cores but each leg re-sorted
    # before the union (the final orderBy still applies)
    from car_etl_spark.queries import normalize as NN

    def tag(df, kind, key, raw, norm):
        return df.select(
            F.lit(kind).alias("kind"),
            key.cast("long").alias("src_key"),
            raw.alias("raw_value"),
            norm.alias("normalized"),
        )

    cur = tag(
        NN._currency_core(spark, SF_DIR).orderBy("o_orderkey"), "currency",
        F.col("o_orderkey"), F.col("raw_value"),
        F.col("normalized").cast("decimal(18,2)").cast("string"),
    )
    dat = tag(
        NN._date_core(spark, SF_DIR).orderBy("o_orderkey"), "date",
        F.col("o_orderkey"), F.col("raw_value"), F.col("normalized_date"),
    )
    pct = tag(
        NN._percent_core(spark, SF_DIR).orderBy("l_orderkey", "l_linenumber"), "percent",
        F.col("l_orderkey") * 10 + F.col("l_linenumber"),
        F.col("raw_value"), F.col("normalized_pct").cast("decimal(18,6)").cast("string"),
    )
    u = cur.unionByName(dat).unionByName(pct)
    return u.orderBy("kind", "src_key")


def suite_unsorted_legs():
    from car_etl_spark.queries import normalize as NN

    def tag(df, kind, key, raw, norm):
        return df.select(
            F.lit(kind).alias("kind"),
            key.cast("long").alias("src_key"),
            raw.alias("raw_value"),
            norm.alias("normalized"),
        )

    cur = tag(
        NN._currency_core(spark, SF_DIR), "currency",
        F.col("o_orderkey"), F.col("raw_value"),
        F.col("normalized").cast("decimal(18,2)").cast("string"),
    )
    dat = tag(
        NN._date_core(spark, SF_DIR), "date",
        F.col("o_orderkey"), F.col("raw_value"), F.col("normalized_date"),
    )
    pct = tag(
        NN._percent_core(spark, SF_DIR), "percent",
        F.col("l_orderkey") * 10 + F.col("l_linenumber"),
        F.col("raw_value"), F.col("normalized_pct").cast("decimal(18,6)").cast("string"),
    )
    u = cur.unionByName(dat).unionByName(pct)
    return u.orderBy("kind", "src_key")


VARIANTS = {
    "date_old": date_old,
    "date_new": date_new,
    "currency_old": currency_old,
    "currency_new": currency_new,
    "3leg_sorted": suite_sorted_legs,
    "3leg_unsorted": suite_unsorted_legs,
    "suite_full": suite_new,
}

times: dict[str, list[float]] = {k: [] for k in VARIANTS}
for r in range(RUNS + 1):
    for name, fn in VARIANTS.items():
        spark.sparkContext.setJobDescription(f"profile_norm:{name}:pass{r}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if r > 0:
            times[name].append(dt)

for name, ts in times.items():
    print(f"{name:14s} median {statistics.median(ts):.3f}s  runs {[round(t, 3) for t in ts]}")
spark.stop()
