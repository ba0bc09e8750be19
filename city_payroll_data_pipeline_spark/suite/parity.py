"""Parity queries: every reference operator (SURVEY §2) expressed
against the driver's TPC-H-ish testdata, with DuckDB oracle SQL.

Column-name mapping of the payroll domain onto the testdata:
``orders`` plays the fact table (o_orderpriority → job_title,
o_totalprice → total_amount), ``lineitem`` plays the raw money-column
source, ``customer`` plays the education roster, ``part`` plays the
hospital charges table.

Determinism: money sums route through DECIMAL(18,2) (exact, order
independent) and cast back to double — see suite.__init__ docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from city_payroll_data_pipeline_spark.suite import Query, table


def _dec_sum(col: F.Column, alias: str, scale: int = 2) -> F.Column:
    """Order-independent double sum via exact decimal accumulation."""
    return (
        F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)
    )


# SQL fragment mirroring _dec_sum for the DuckDB oracle.
def _sql_dec_sum(expr: str, alias: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def _sql_round(expr: str, n: int = 2) -> str:
    """DuckDB emulation of Spark's ROUND-on-double.

    Spark rounds the double's shortest decimal representation HALF_UP
    (away from zero); DuckDB's native round() computes
    ``round(x*10^n)/10^n`` in binary, so the two disagree on exact
    ".xx5" shortest representations (e.g. 159.605 → 159.61 vs 159.60).
    Routing through VARCHAR (shortest repr) → DECIMAL → decimal ROUND
    (half away from zero) reproduces Spark's result bit-for-bit.
    Scale 20 holds the full 17-significant-digit shortest repr for any
    magnitude where 2-dp rounding is sensitive (no double-rounding).
    """
    return (
        f"CAST(ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,20)), {n}) "
        f"AS DOUBLE)"
    )


# --------------------------------------------------------------------------
# A1 + O2 — THE budget report (serve_flight.py:295)
# --------------------------------------------------------------------------

def q_budget_report(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("job_title"))
        .agg(
            F.count("*").alias("total_employee"),
            _dec_sum(F.col("o_totalprice"), "total_budget"),
        )
        .orderBy(F.desc("total_budget"))
    )


BUDGET_REPORT_SQL = f"""
SELECT o_orderpriority AS job_title,
       COUNT(*) AS total_employee,
       {_sql_dec_sum('o_totalprice', 'total_budget')}
FROM orders
GROUP BY o_orderpriority
ORDER BY total_budget DESC
"""

# --------------------------------------------------------------------------
# P5 + O1 — full export (serve_flight.py:291)
# --------------------------------------------------------------------------

def q_full_export(spark, sf_dir):
    return table(spark, sf_dir, "orders").orderBy("o_orderpriority")


FULL_EXPORT_SQL = "SELECT * FROM orders ORDER BY o_orderpriority"

# --------------------------------------------------------------------------
# O3 — top-k (app.py:390-393); deterministic tiebreak on the key
# --------------------------------------------------------------------------

def q_top_k_spenders(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("customer"))
        .agg(_dec_sum(F.col("o_totalprice"), "total_budget"))
        .orderBy(F.desc("total_budget"), F.asc("customer"))
        .limit(10)
    )


TOP_K_SPENDERS_SQL = f"""
SELECT o_custkey AS customer,
       {_sql_dec_sum('o_totalprice', 'total_budget')}
FROM orders
GROUP BY o_custkey
ORDER BY total_budget DESC, customer ASC
LIMIT 10
"""

# --------------------------------------------------------------------------
# A2-A6 — dashboard KPI scalars over the budget report
# (app.py:340-342,490-495): sums, guarded ratio, count, max/min, exact median
# --------------------------------------------------------------------------

def q_kpi_stats(spark, sf_dir):
    report = q_budget_report(spark, sf_dir)
    return report.agg(
        _dec_sum(F.col("total_budget"), "sum_total_budget"),
        F.sum("total_employee").alias("sum_total_employee"),
        F.round(
            F.sum(F.col("total_budget").cast("decimal(18,2)")).cast("double")
            / F.when(F.sum("total_employee") != 0, F.sum("total_employee")),
            2,
        ).alias("avg_salary"),
        F.count("*").alias("n_positions"),
        F.max("total_budget").alias("max_budget"),
        F.min("total_budget").alias("min_budget"),
        F.median("total_budget").alias("median_budget"),
    )


KPI_STATS_SQL = f"""
WITH report AS (
  SELECT o_orderpriority AS job_title,
         COUNT(*) AS total_employee,
         {_sql_dec_sum('o_totalprice', 'total_budget')}
  FROM orders GROUP BY o_orderpriority
)
SELECT {_sql_dec_sum('total_budget', 'sum_total_budget')},
       CAST(SUM(total_employee) AS BIGINT) AS sum_total_employee,
       {_sql_round('CAST(SUM(CAST(total_budget AS DECIMAL(18,2))) AS DOUBLE) / NULLIF(SUM(total_employee), 0)', 2)} AS avg_salary,
       COUNT(*) AS n_positions,
       MAX(total_budget) AS max_budget,
       MIN(total_budget) AS min_budget,
       MEDIAN(total_budget) AS median_budget
FROM report
"""

# --------------------------------------------------------------------------
# F1/F2/F4 — currency strip + cast + zero-fill (stg_corporate.sql:21-30).
# The testdata has no dirty money strings, so the query synthesizes the
# reference's input format ("$1234.56") losslessly via DECIMAL→VARCHAR,
# then runs the actual cleaning path under test.
# --------------------------------------------------------------------------

def q_money_clean_cast(spark, sf_dir):
    # the PRODUCTION cleaning path (functions/cleaning.py), not an
    # inline re-spelling: stg_corporate runs money_to_double
    # (regexp_replace + try_cast), so a regression there must fail
    # THIS oracle gate — an inline cast() twin would keep passing
    from city_payroll_data_pipeline_spark.functions.cleaning import (
        money_to_double,
        zero_fill,
    )

    li = table(spark, sf_dir, "lineitem")
    money = F.concat(
        F.lit("$"), F.col("l_extendedprice").cast("decimal(18,2)").cast("string")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money.alias("raw_money"),
        zero_fill(money_to_double(money)).alias("base_pay"),
    )


MONEY_CLEAN_CAST_SQL = """
SELECT l_orderkey,
       l_linenumber,
       '$' || CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS raw_money,
       COALESCE(
         CAST(REGEXP_REPLACE('$' || CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
                             '[$,]', '', 'g') AS DOUBLE),
         0.0) AS base_pay
FROM lineitem
"""

# --------------------------------------------------------------------------
# F7/F10/F13/F5/F6 — the corporate fact derivations (fct_corporate.sql:20-34)
# on lineitem: additive total, 3-branch CASE with strict >, guarded ratio
# --------------------------------------------------------------------------

def q_fct_derivations(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice")
            + F.col("l_extendedprice") * F.col("l_discount")
            + F.col("l_extendedprice") * F.col("l_tax")
        ).alias("total_amount"),
        F.when(F.col("l_discount") > 0.25 * F.col("l_tax"), "High Overtime")
        .when(F.col("l_discount") > 0, "Regular Overtime")
        .otherwise("No Overtime")
        .alias("overtime_status"),
        F.round(
            F.col("l_tax") / F.when(F.col("l_discount") != 0, F.col("l_discount")) * 100,
            2,
        ).alias("loyalty_bonus_percentage"),
    )


FCT_DERIVATIONS_SQL = f"""
SELECT l_orderkey,
       l_linenumber,
       (l_extendedprice + l_extendedprice * l_discount
          + l_extendedprice * l_tax) AS total_amount,
       CASE WHEN l_discount > 0.25 * l_tax THEN 'High Overtime'
            WHEN l_discount > 0 THEN 'Regular Overtime'
            ELSE 'No Overtime' END AS overtime_status,
       {_sql_round('l_tax / NULLIF(l_discount, 0) * 100', 2)} AS loyalty_bonus_percentage
FROM lineitem
"""

# --------------------------------------------------------------------------
# F8/F9/F11 — the education fact derivations (models/education/
# fct_corporate.sql:19-34) on customer: two-branch CASE, conditional
# bonus, additive total with nested CASE
# --------------------------------------------------------------------------

def q_education_bonus(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    bonus = F.when(
        F.col("c_nationkey") > 15, F.col("c_acctbal") * 0.05
    ).otherwise(F.lit(0.0))
    return cust.select(
        F.col("c_custkey").alias("teacher_id"),
        F.col("c_acctbal").alias("base_salary"),
        F.col("c_nationkey").cast("double").alias("experience_years"),
        F.when(F.col("c_acctbal") >= 0, "Full Time")
        .otherwise("Part Time / Adjunct")
        .alias("employment_status"),
        bonus.alias("seniority_bonus"),
        (F.col("c_acctbal") + bonus).alias("total_amount"),
        F.round(
            F.col("c_acctbal")
            / F.when(F.col("c_nationkey") != 0, F.col("c_nationkey")),
            2,
        ).alias("cost_per_experience_year"),
    )


EDUCATION_BONUS_SQL = f"""
SELECT c_custkey AS teacher_id,
       c_acctbal AS base_salary,
       CAST(c_nationkey AS DOUBLE) AS experience_years,
       CASE WHEN c_acctbal >= 0 THEN 'Full Time'
            ELSE 'Part Time / Adjunct' END AS employment_status,
       CASE WHEN c_nationkey > 15 THEN c_acctbal * 0.05 ELSE 0.0 END AS seniority_bonus,
       (c_acctbal + CASE WHEN c_nationkey > 15 THEN c_acctbal * 0.05 ELSE 0.0 END)
         AS total_amount,
       {_sql_round('c_acctbal / NULLIF(c_nationkey, 0)', 2)} AS cost_per_experience_year
FROM customer
"""

# --------------------------------------------------------------------------
# F3/F12 + P3 — the hospital fact (fct_hospital.sql:6-17) on part:
# int cast, int×double multiply, contract renames
# --------------------------------------------------------------------------

def q_hospital_amount(spark, sf_dir):
    part = table(spark, sf_dir, "part")
    return part.select(
        F.col("p_name").alias("hospital_name"),
        F.col("p_type").alias("job_title"),
        F.col("p_brand").alias("city"),
        F.col("p_size").cast("int").alias("total_patients"),
        F.col("p_retailprice").alias("avg_payment_per_patient"),
        (F.col("p_size").cast("int") * F.col("p_retailprice")).alias("total_amount"),
    )


HOSPITAL_AMOUNT_SQL = """
SELECT p_name AS hospital_name,
       p_type AS job_title,
       p_brand AS city,
       CAST(p_size AS INTEGER) AS total_patients,
       p_retailprice AS avg_payment_per_patient,
       CAST(p_size AS INTEGER) * p_retailprice AS total_amount
FROM part
"""

# --------------------------------------------------------------------------
# P6/P7 — dashboard defensive cleaning (app.py:329-334): numeric
# coercion (invalid → NULL) then dropna. Synthesizes some malformed
# numerics so the coercion path is actually exercised.
# --------------------------------------------------------------------------

def q_filter_dropna(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    dirty = F.when(F.col("event_id") % 7 == 0, F.lit("N/A")).otherwise(
        F.col("value").cast("string")
    )
    return (
        ev.select(
            "event_id",
            "event_type",
            # try_cast = pd.to_numeric(errors='coerce') semantics (invalid →
            # NULL) independent of the session's ANSI setting
            dirty.try_cast("double").alias("value_clean"),
        )
        .na.drop(subset=["event_type", "value_clean"])
    )


FILTER_DROPNA_SQL = """
SELECT event_id, event_type, value_clean
FROM (
  SELECT event_id, event_type,
         TRY_CAST(CASE WHEN event_id % 7 = 0 THEN 'N/A'
                       ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS value_clean
  FROM events
)
WHERE event_type IS NOT NULL AND value_clean IS NOT NULL
"""

# --------------------------------------------------------------------------
# S2 — header normalization (stg_hospital.sql:28): rename a messy-header
# frame DuckDB-style. Exercised by aliasing testdata columns to messy
# names, then normalizing.
# --------------------------------------------------------------------------

def q_normalize_names(spark, sf_dir):
    from city_payroll_data_pipeline_spark.schemas import normalize_columns

    nation = table(spark, sf_dir, "nation")
    messy = nation.select(
        F.col("n_nationkey").alias("Nation Key"),
        F.col("n_name").alias(" Nation  Name "),
        F.col("n_regionkey").alias("REGION-KEY"),
    )
    return normalize_columns(messy)


NORMALIZE_NAMES_SQL = """
SELECT n_nationkey AS nation_key,
       n_name AS nation_name,
       n_regionkey AS region_key
FROM nation
"""

# --------------------------------------------------------------------------
# O4 — preview limit (app.py:239): deterministic via key-ordered limit
# --------------------------------------------------------------------------

def q_preview_limit(spark, sf_dir):
    return (
        table(spark, sf_dir, "region").orderBy("r_regionkey").limit(3)
    )


PREVIEW_LIMIT_SQL = "SELECT * FROM region ORDER BY r_regionkey LIMIT 3"


# --------------------------------------------------------------------------
# F15 — SHA-256 digest (the reference hashes passwords with hashlib,
# serve_flight.py:41-44; in-engine it's F.sha2 — used here on document
# text as a content fingerprint)
# --------------------------------------------------------------------------

def q_sha256_digest(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_sha256")
    )


SHA256_DIGEST_SQL = "SELECT doc_id, sha256(text) AS content_sha256 FROM documents"

# --------------------------------------------------------------------------
# F14 — audit timestamp (CURRENT_TIMESTAMP AS processed_at). Inherently
# non-deterministic → no oracle; driver records a rows-only check. The
# query proves the column materializes with a stable schema.
# --------------------------------------------------------------------------

def q_audit_timestamp(spark, sf_dir):
    region = table(spark, sf_dir, "region")
    return region.select(
        "r_regionkey", "r_name", F.current_timestamp().alias("processed_at")
    )


def q_budget_report_sql(spark, sf_dir):
    """SQL-surface twin of budget_report: engine tables are plain
    views, so user-written ANSI SQL runs through the same Catalyst
    planner as the DataFrame API — the oracle string itself IS the
    Spark query (modulo the view name), proving the two surfaces are
    interchangeable."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(BUDGET_REPORT_SQL.replace("FROM orders", "FROM orders_v"))


QUERIES = {
    "budget_report_sql": Query(
        q_budget_report_sql, BUDGET_REPORT_SQL, ("agg", "sql_surface")
    ),
    "budget_report": Query(q_budget_report, BUDGET_REPORT_SQL, ("A1", "O2")),
    "sha256_digest": Query(q_sha256_digest, SHA256_DIGEST_SQL, ("F15",)),
    "audit_timestamp": Query(q_audit_timestamp, None, ("F14",)),
    "full_export": Query(q_full_export, FULL_EXPORT_SQL, ("P5", "O1")),
    "top_k_spenders": Query(q_top_k_spenders, TOP_K_SPENDERS_SQL, ("O3",)),
    "kpi_stats": Query(q_kpi_stats, KPI_STATS_SQL, ("A2", "A3", "A4", "A5", "A6")),
    "money_clean_cast": Query(q_money_clean_cast, MONEY_CLEAN_CAST_SQL, ("F1", "F2", "F4")),
    "fct_derivations": Query(
        q_fct_derivations, FCT_DERIVATIONS_SQL, ("F5", "F6", "F7", "F10", "F13")
    ),
    "education_bonus": Query(
        q_education_bonus, EDUCATION_BONUS_SQL, ("F8", "F9", "F11")
    ),
    "hospital_amount": Query(q_hospital_amount, HOSPITAL_AMOUNT_SQL, ("F3", "F12", "P3")),
    "filter_dropna": Query(q_filter_dropna, FILTER_DROPNA_SQL, ("P6", "P7")),
    "normalize_names": Query(q_normalize_names, NORMALIZE_NAMES_SQL, ("S2", "P1")),
    "preview_limit": Query(q_preview_limit, PREVIEW_LIMIT_SQL, ("O4",)),
}
