"""Query catalog: every declared engine capability with its DuckDB oracle.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with the equivalent ANSI SQL the driver runs through DuckDB on the same
parquet tables.  Entries with ``oracle=None`` are genuinely
non-SQL-expressible (or rely on engine-specific hashing) and get the
driver's weaker rows-only check; each of those is covered by dedicated
pytest fixtures instead.

PARITY RULES (why these queries hash-match bit-for-bit):
* money/double sums go through DECIMAL(25,6) in BOTH engines → exact;
* ratios/avgs divide the resulting identical doubles → identical IEEE ops;
* dims use integer arithmetic + CASE only; day strings via
  date_format/strftime (verified equal);
* ``floor()`` before every double→int cast (Spark truncates, DuckDB
  rounds);
* every computed column aliased identically on both sides.

The synthetic ads/CRM constructions mirror sources/synthetic.py — the SQL
here and the column expressions there MUST stay in sync.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from admira_etl_project_prueba_spark.operators import analytics
from admira_etl_project_prueba_spark.operators.analytics import dec6 as _dec6
from admira_etl_project_prueba_spark.operators.export import consolidate_for_export
from admira_etl_project_prueba_spark.operators.queries import (
    debug_ads_by_date,
    debug_crm_by_date,
    debug_matches,
    metrics_by_campaign,
    metrics_by_channel,
    metrics_by_date,
    paginate,
)
from admira_etl_project_prueba_spark.operators.transform import transform
from admira_etl_project_prueba_spark.functions.dates import parse_flexible_timestamp
from admira_etl_project_prueba_spark.sources.synthetic import (
    synthetic_ads,
    synthetic_crm,
    synthetic_crm_raw_dates,
)
from admira_etl_project_prueba_spark.sources.tables import load_events, load_table


@dataclass
class CatalogEntry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


# ===========================================================================
# Oracle SQL building blocks (DuckDB dialect, ANSI-compatible)
# ===========================================================================

_CHANNEL_CASE = (
    "CASE {src} WHEN 'google' THEN 'google_ads' WHEN 'facebook' THEN 'facebook_ads' "
    "WHEN 'tiktok' THEN 'tiktok_ads' WHEN 'linkedin' THEN 'linkedin_ads' "
    "ELSE {src} || '_' || {med} END"
)

_UTM_DIMS = """
    CASE user_id % 3 WHEN 0 THEN 'back_to_school' WHEN 1 THEN 'summer_sale'
         ELSE 'test_campaign' END AS utm_campaign,
    CASE user_id % 5 WHEN 0 THEN 'google' WHEN 1 THEN 'facebook' WHEN 2 THEN 'tiktok'
         WHEN 3 THEN 'linkedin' ELSE 'newsletter' END AS utm_source,
    CASE event_id % 3 WHEN 0 THEN 'cpc' WHEN 1 THEN 'social' ELSE 'email' END AS utm_medium
"""

_ADS_CTE = f"""
ads AS (
  SELECT strftime(ts, '%Y-%m-%d') AS date,
         'C-100' || CAST(user_id % 5 AS VARCHAR) AS campaign_id,
         {_UTM_DIMS},
         CAST(floor(value) AS INTEGER) % 50 AS clicks,
         CAST(floor(value * 13) AS INTEGER) % 1000 AS impressions,
         value AS cost
  FROM events WHERE event_type IN ('click', 'view')
),
ads_ch AS (
  SELECT *, {_CHANNEL_CASE.format(src='utm_source', med='utm_medium')} AS channel FROM ads
)"""

_CRM_CTE = f"""
crm AS (
  SELECT 'O-' || CAST(event_id AS VARCHAR) AS opportunity_id,
         'user' || CAST(user_id AS VARCHAR) || '@example.com' AS contact_email,
         CASE event_type WHEN 'signup' THEN 'lead' WHEN 'error' THEN 'opportunity'
              ELSE CASE WHEN value < 20 THEN 'prospect' ELSE 'closed_won' END END AS stage,
         value AS amount,
         {_UTM_DIMS},
         ts AS created_at,
         event_id
  FROM events WHERE event_type IN ('signup', 'purchase', 'error')
)"""

# A1 + A2: conform → UNION ALL → 6-key hash agg → guarded ratios
_METRICS_CTE = f"""
{_ADS_CTE},
{_CRM_CTE},
unioned AS (
  SELECT date, channel, campaign_id, utm_campaign, utm_source, utm_medium,
         CAST(clicks AS BIGINT) AS clicks, CAST(impressions AS BIGINT) AS impressions,
         CAST(cost AS DECIMAL(25,6)) AS cost,
         CAST(0 AS BIGINT) AS leads, CAST(0 AS BIGINT) AS opportunities,
         CAST(0 AS BIGINT) AS closed_won, CAST(0 AS DECIMAL(25,6)) AS revenue
  FROM ads_ch
  UNION ALL
  SELECT strftime(created_at, '%Y-%m-%d') AS date,
         {_CHANNEL_CASE.format(src='utm_source', med='utm_medium')} AS channel,
         '' AS campaign_id, utm_campaign, utm_source, utm_medium,
         CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS DECIMAL(25,6)),
         CAST(CASE WHEN stage = 'lead' THEN 1 ELSE 0 END AS BIGINT),
         CAST(CASE WHEN stage = 'opportunity' THEN 1 ELSE 0 END AS BIGINT),
         CAST(CASE WHEN stage = 'closed_won' THEN 1 ELSE 0 END AS BIGINT),
         CAST(CASE WHEN stage = 'closed_won' THEN amount ELSE 0 END AS DECIMAL(25,6))
  FROM crm
),
consolidated AS (
  SELECT date, channel, campaign_id, utm_campaign, utm_source, utm_medium,
         CAST(SUM(clicks) AS BIGINT) AS clicks,
         CAST(SUM(impressions) AS BIGINT) AS impressions,
         CAST(SUM(cost) AS DOUBLE) AS cost,
         CAST(SUM(leads) AS BIGINT) AS leads,
         CAST(SUM(opportunities) AS BIGINT) AS opportunities,
         CAST(SUM(closed_won) AS BIGINT) AS closed_won,
         CAST(SUM(revenue) AS DOUBLE) AS revenue
  FROM unioned
  GROUP BY 1, 2, 3, 4, 5, 6
),
metrics AS (
  SELECT *,
         CASE WHEN clicks > 0 THEN cost / clicks ELSE 0.0 END AS cpc,
         CASE WHEN leads > 0 THEN cost / leads ELSE 0.0 END AS cpa,
         CASE WHEN leads > 0 THEN CAST(opportunities AS DOUBLE) / leads ELSE 0.0 END AS cvr_lead_to_opp,
         CASE WHEN opportunities > 0 THEN CAST(closed_won AS DOUBLE) / opportunities ELSE 0.0 END AS cvr_opp_to_won,
         CASE WHEN cost > 0 THEN revenue / cost ELSE 0.0 END AS roas
  FROM consolidated
)"""

_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(25,6))) AS DOUBLE)"


# ===========================================================================
# Spark-side helpers
# ===========================================================================

def _ads(spark, sf_dir):
    return synthetic_ads(load_events(spark, sf_dir))


def _crm(spark, sf_dir):
    return synthetic_crm(load_events(spark, sf_dir))


def _metrics(spark, sf_dir):
    return transform(_ads(spark, sf_dir), _crm(spark, sf_dir))


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _all(spark, sf_dir):
    return {
        n: load_table(spark, sf_dir, n)
        for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    }


# ===========================================================================
# The catalog
# ===========================================================================

CATALOG: dict[str, CatalogEntry] = {}

#: Bounded local oracles for entries whose exact output is engine-specific
#: (approximate sketches).  The driver's gate records these as rows-only;
#: tools/oracle_check.py additionally joins the Spark result to this
#: DuckDB reference on ``keys`` and asserts per-column RELATIVE error
#: ≤ ``rel_tol`` (0.0 ⇒ exact), so the local gate proves value quality,
#: not just row counts.  Reference columns are aliased to the Spark names.
BOUNDED_ORACLES: dict[str, dict] = {
    # The two HLL entries (events_approx_distinct in round 9a,
    # events_distinct_rollup_sketched in round 9b) graduated to
    # hash-exact oracles: each gated frame is now the deterministic
    # bound-check (exact count + hll_within_tol), so the rel-tol specs
    # they carried here are enforced INSIDE the query and hash-verified.
    # events_approx_percentiles graduated in round 8 via GK-exact rank
    # CTEs.  stratified_sample graduated in round 10: membership is now
    # the engine-portable md5 bucket (train_test_split recipe applied
    # per stratum), so the whole sample is hash-exact.  This dict is
    # intentionally empty — every catalog entry carries an exact oracle.
    # The five sampled quantile twins (user_value_quartiles_sampled,
    # user_rfm_segments_sampled, curriculum_stages_sampled,
    # quality_calibrated_sampled, supplier_revenue_distribution_sampled)
    # graduated from bounded specs to EXACT DuckDB oracles in round 8:
    # below the sketch accuracy (10k rows per metric frame — every gate
    # SF qualifies) Spark's approx_percentile/GK edges are exactly the
    # order statistics at rank ceil(p·n), so the whole sampled output is
    # expressible as exact SQL (see _gk_edges_cte).  events_approx_
    # percentiles graduated the same way (accuracy pinned above every
    # gate SF's group size).  The inherently-bounded residue is exactly
    # the three entries above: the two HLL-sketch-valued counts and the
    # engine-RNG sample.
}


def _gk_edges_cte(src: str, val: str, probs: list[float], rk: str, ed: str) -> str:
    """CTE pair replicating Spark ``approx_percentile``'s Greenwald-
    Khanna edges EXACTLY at test scale, for the sampled-twin oracles.

    Below the sketch accuracy (n < 10 000) GK keeps every sample with
    g=1, delta=0 (the compress threshold 2·ε·n stays < 1), so
    ``query(p)`` returns precisely the order statistic at 1-indexed rank
    ``ceil(p · n)`` of the DOUBLE-cast values.  ``ceil`` runs on the
    same IEEE-754 product in both engines: the prob literals are the
    identical shortest-repr doubles Spark's edge_expr embeds
    (functions/quantiles.py:38), and the list is cast DOUBLE[] because
    DuckDB would otherwise parse them as DECIMALs — decimal 0.07·100
    is exactly 7 while the double product is 7.000000000000001, an
    off-by-one rank flip vs Spark.  So the rank math is bit-identical.
    This is a TEST-SCALE oracle: valid for any gate SF (all metric
    frames < 10k rows), NOT a general sketch equivalence.

    Emits ``{rk}`` (value, rank, n) and ``{ed}`` (one edge row per
    prob, duplicates preserved — the row-local bucket folds count edge
    multiplicity exactly like Spark's ``aggregate`` over the edges
    array).
    """
    plist = ", ".join(repr(p) for p in probs)
    return f"""{rk} AS (
  SELECT CAST({val} AS DOUBLE) AS v,
         ROW_NUMBER() OVER (ORDER BY CAST({val} AS DOUBLE)) AS rn,
         COUNT(*) OVER () AS n
  FROM {src}
),
{ed} AS (
  SELECT r.v FROM (SELECT UNNEST(CAST([{plist}] AS DOUBLE[])) AS p) pr
  JOIN {rk} r ON r.rn = CAST(ceil(pr.p * r.n) AS BIGINT)
)"""


_Q3 = [i / 4 for i in range(1, 4)]      # quartile edge probs, as Spark emits them
_Q99 = [i / 100 for i in range(1, 100)]  # 99-edge centile grid


def _entry(name: str, doc: str, oracle: Optional[str]):
    def wrap(fn):
        CATALOG[name] = CatalogEntry(fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


# -- reference surface: ingest/consolidation (SURVEY §2.4 A1/A2) ------------

@_entry(
    "ingest_consolidate",
    "A1+A2+F9+F10+F12: full union-aggregate consolidation of the synthetic "
    "ads/CRM views into the 18-column metrics fact table.",
    f"WITH {_METRICS_CTE} SELECT * FROM metrics",
)
def _q_ingest(spark, sf_dir):
    return _metrics(spark, sf_dir)


@_entry(
    "ingest_since_filter",
    "F1: consolidation + inclusive since-filter applied AFTER aggregation "
    "(reference dataflow order, handlers.go:76-122).",
    f"WITH {_METRICS_CTE} SELECT * FROM metrics WHERE CAST(date AS DATE) >= DATE '2024-01-15'",
)
def _q_since(spark, sf_dir):
    return transform(_ads(spark, sf_dir), _crm(spark, sf_dir), since="2024-01-15")


# -- reference surface: storage scans + pagination (F3-F5, P1) ---------------

@_entry(
    "metrics_by_channel_page1",
    "F3+P1: GET /metrics/channel — channel + inclusive date range, "
    "canonically sorted, first page (limit 100).",
    f"""WITH {_METRICS_CTE}
SELECT * FROM metrics
WHERE channel = 'google_ads'
  AND CAST(date AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-25'
ORDER BY date, channel, campaign_id, utm_campaign, utm_source, utm_medium
LIMIT 100 OFFSET 0""",
)
def _q_channel1(spark, sf_dir):
    q = metrics_by_channel(_metrics(spark, sf_dir), "google_ads", "2024-01-05", "2024-01-25")
    return paginate(q, limit=100, offset=0)


@_entry(
    "metrics_by_channel_page2",
    "P1: second page of the same scan (offset 100) — proves deterministic "
    "offset pagination.",
    f"""WITH {_METRICS_CTE}
SELECT * FROM metrics
WHERE channel = 'google_ads'
  AND CAST(date AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-25'
ORDER BY date, channel, campaign_id, utm_campaign, utm_source, utm_medium
LIMIT 100 OFFSET 100""",
)
def _q_channel2(spark, sf_dir):
    q = metrics_by_channel(_metrics(spark, sf_dir), "google_ads", "2024-01-05", "2024-01-25")
    return paginate(q, limit=100, offset=100)


@_entry(
    "funnel_by_campaign",
    "F4: GET /metrics/funnel — utm_campaign + date range, no pagination.",
    f"""WITH {_METRICS_CTE}
SELECT * FROM metrics
WHERE utm_campaign = 'back_to_school'
  AND CAST(date AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-31'""",
)
def _q_funnel(spark, sf_dir):
    return metrics_by_campaign(_metrics(spark, sf_dir), "back_to_school", "2024-01-01", "2024-01-31")


@_entry(
    "metrics_by_date",
    "F5: exact-day scan (partition-pruning hit on the stored fact table).",
    f"WITH {_METRICS_CTE} SELECT * FROM metrics WHERE CAST(date AS DATE) = DATE '2024-01-10'",
)
def _q_bydate(spark, sf_dir):
    return metrics_by_date(_metrics(spark, sf_dir), "2024-01-10")


# -- reference surface: export re-consolidation (A3) -------------------------

@_entry(
    "export_day",
    "A3: coarse re-consolidation of one day (channel, campaign_id, "
    "utm_campaign), measures re-summed, ratios re-derived, deterministic "
    "min() for the demoted utm dims.",
    f"""WITH {_METRICS_CTE},
day AS (SELECT * FROM metrics WHERE CAST(date AS DATE) = DATE '2024-01-10'),
coarse AS (
  SELECT channel, campaign_id, utm_campaign,
         MIN(date) AS date,
         CAST(SUM(clicks) AS BIGINT) AS clicks,
         CAST(SUM(impressions) AS BIGINT) AS impressions,
         {_DSUM.format(x='cost')} AS cost,
         CAST(SUM(leads) AS BIGINT) AS leads,
         CAST(SUM(opportunities) AS BIGINT) AS opportunities,
         CAST(SUM(closed_won) AS BIGINT) AS closed_won,
         {_DSUM.format(x='revenue')} AS revenue,
         MIN(utm_source) AS utm_source,
         MIN(utm_medium) AS utm_medium
  FROM day GROUP BY 1, 2, 3
)
SELECT date, channel, campaign_id, utm_campaign, utm_source, utm_medium,
       clicks, impressions, cost, leads, opportunities, closed_won, revenue,
       CASE WHEN clicks > 0 THEN cost / clicks ELSE 0.0 END AS cpc,
       CASE WHEN leads > 0 THEN cost / leads ELSE 0.0 END AS cpa,
       CASE WHEN leads > 0 THEN CAST(opportunities AS DOUBLE) / leads ELSE 0.0 END AS cvr_lead_to_opp,
       CASE WHEN opportunities > 0 THEN CAST(closed_won AS DOUBLE) / opportunities ELSE 0.0 END AS cvr_opp_to_won,
       CASE WHEN cost > 0 THEN revenue / cost ELSE 0.0 END AS roas
FROM coarse""",
)
def _q_export(spark, sf_dir):
    return consolidate_for_export(metrics_by_date(_metrics(spark, sf_dir), "2024-01-10"))


# -- reference surface: debug endpoints (F6) ---------------------------------

@_entry(
    "debug_ads_by_date",
    "F6: GET /debug/ads?date= — raw ads rows for one day.",
    f"""WITH {_ADS_CTE}
SELECT date, campaign_id, utm_campaign, utm_source, utm_medium,
       clicks, impressions, cost, channel
FROM ads_ch WHERE date = '2024-01-10'""",
)
def _q_dbg_ads(spark, sf_dir):
    return debug_ads_by_date(_ads(spark, sf_dir), "2024-01-10").drop("ingested_at")


@_entry(
    "debug_crm_by_date",
    "F6: GET /debug/crm?date= — raw CRM rows whose created_at day matches.",
    f"""WITH {_CRM_CTE}
SELECT opportunity_id, contact_email, stage, amount,
       utm_campaign, utm_source, utm_medium,
       strftime(created_at, '%Y-%m-%d %H:%M:%S.%f') AS created_at_str
FROM crm WHERE CAST(created_at AS DATE) = DATE '2024-01-10'""",
)
def _q_dbg_crm(spark, sf_dir):
    df = debug_crm_by_date(_crm(spark, sf_dir), "2024-01-10")
    return df.select(
        "opportunity_id",
        "contact_email",
        "stage",
        "amount",
        "utm_campaign",
        "utm_source",
        "utm_medium",
        F.date_format("created_at", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("created_at_str"),
    )


@_entry(
    "debug_matches_ads",
    "F6: GET /debug/matches — ads side of the two independent per-source "
    "filters (deliberately NOT a join, handlers.go:458-501).",
    f"""WITH {_ADS_CTE}
SELECT date, campaign_id, utm_campaign, utm_source, utm_medium,
       clicks, impressions, cost, channel
FROM ads_ch WHERE utm_campaign = 'summer_sale'""",
)
def _q_match_ads(spark, sf_dir):
    a, _ = debug_matches(_ads(spark, sf_dir), _crm(spark, sf_dir), "summer_sale")
    return a.drop("ingested_at")


@_entry(
    "debug_matches_crm",
    "F6: GET /debug/matches — CRM side.",
    f"""WITH {_CRM_CTE}
SELECT opportunity_id, stage, amount, utm_campaign, utm_source, utm_medium
FROM crm WHERE utm_campaign = 'summer_sale'""",
)
def _q_match_crm(spark, sf_dir):
    _, c = debug_matches(_ads(spark, sf_dir), _crm(spark, sf_dir), "summer_sale")
    return c.select("opportunity_id", "stage", "amount", "utm_campaign", "utm_source", "utm_medium")


# -- reference scalar functions: F7/F8 parse cascade, F9 channels ------------

@_entry(
    "crm_parse_flexible",
    "F7+F8: multi-format created_at strings (rotating layouts + an "
    "unparseable one) through the first-match-wins parse cascade; "
    "deterministic NULL on failure.",
    f"""WITH {_CRM_CTE},
raw AS (
  SELECT opportunity_id, event_id,
         CASE event_id % 6
           WHEN 0 THEN strftime(created_at, '%Y-%m-%dT%H:%M:%SZ')
           WHEN 1 THEN strftime(created_at, '%Y-%m-%d %H:%M:%S')
           WHEN 2 THEN strftime(created_at, '%Y-%m-%d')
           WHEN 3 THEN strftime(created_at, '%Y/%m/%d %H:%M:%S')
           WHEN 4 THEN '  ' || strftime(created_at, '%Y-%m-%d %H:%M:%S') || '  '
           ELSE 'not-a-date' END AS created_at_raw
  FROM crm
),
norm AS (
  SELECT opportunity_id, created_at_raw,
         replace(trim(created_at_raw), '/', '-') AS n
  FROM raw
)
SELECT opportunity_id, created_at_raw,
       strftime(COALESCE(
         try_strptime(n, '%Y-%m-%dT%H:%M:%SZ'),
         try_strptime(n, '%Y-%m-%d %H:%M:%S'),
         try_strptime(n, '%Y-%m-%d')
       ), '%Y-%m-%d %H:%M:%S') AS parsed,
       COALESCE(
         try_strptime(n, '%Y-%m-%dT%H:%M:%SZ'),
         try_strptime(n, '%Y-%m-%d %H:%M:%S'),
         try_strptime(n, '%Y-%m-%d')
       ) IS NULL AS is_fallback
FROM norm""",
)
def _q_parse(spark, sf_dir):
    df = synthetic_crm_raw_dates(load_events(spark, sf_dir))
    parsed = parse_flexible_timestamp("created_at_raw")
    return df.select(
        "opportunity_id",
        "created_at_raw",
        F.date_format(parsed, "yyyy-MM-dd HH:mm:ss").alias("parsed"),
        parsed.isNull().alias("is_fallback"),
    )


@_entry(
    "channel_inference",
    "F9: the utm_source switch incl. the '{source}_{medium}' default branch, "
    "over every distinct synthetic UTM pair.",
    f"""WITH {_ADS_CTE}
SELECT DISTINCT utm_source, utm_medium, channel FROM ads_ch""",
)
def _q_channels(spark, sf_dir):
    return _ads(spark, sf_dir).select("utm_source", "utm_medium", "channel").distinct()


# -- generic analytics: TPC-H-style (joins, wide aggs) -----------------------

@_entry(
    "q1_pricing_summary",
    "TPC-H Q1: scan + wide hash aggregate with exact decimal sums.",
    f"""SELECT l_returnflag, l_linestatus,
       {_DSUM.format(x='l_quantity')} AS sum_qty,
       {_DSUM.format(x='l_extendedprice')} AS sum_base_price,
       {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
       {_DSUM.format(x='l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)')} AS sum_charge,
       {_DSUM.format(x='l_quantity')} / COUNT(*) AS avg_qty,
       {_DSUM.format(x='l_extendedprice')} / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
)
def _q1(spark, sf_dir):
    return analytics.q1_pricing_summary(_t(spark, sf_dir, "lineitem"))


@_entry(
    "q3_shipping_priority",
    "TPC-H Q3: 3-way join, revenue agg, deterministic top-10.",
    f"""SELECT l_orderkey,
       {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10""",
)
def _q3(spark, sf_dir):
    return analytics.q3_shipping_priority(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


@_entry(
    "q5_local_supplier_volume",
    "TPC-H Q5: 6-way join with broadcast dims; local-supplier condition.",
    f"""SELECT n_name,
       {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name""",
)
def _q5(spark, sf_dir):
    return analytics.q5_local_supplier_volume(_all(spark, sf_dir))


@_entry(
    "q6_revenue_forecast",
    "TPC-H Q6: pure scan-filter-sum (full predicate pushdown).",
    f"""SELECT COALESCE({_DSUM.format(x='l_extendedprice * l_discount')}, 0.0) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24""",
)
def _q6(spark, sf_dir):
    return analytics.q6_revenue_forecast(_t(spark, sf_dir, "lineitem"))


@_entry(
    "q10_returned_items",
    "TPC-H Q10: returned-item revenue, 4-way join, deterministic top-20.",
    f"""SELECT c_custkey, c_name,
       {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
)
def _q10(spark, sf_dir):
    return analytics.q10_returned_items(_all(spark, sf_dir))


@_entry(
    "q4_order_priority",
    "TPC-H Q4 (adapted): EXISTS → LeftSemi hash join; only l_orderkey "
    "shuffles, never lineitem payloads.",
    """SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority""",
)
def _q4(spark, sf_dir):
    return analytics.q4_order_priority(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


@_entry(
    "q7_volume_shipping",
    "TPC-H Q7 (adapted): bilateral nation-pair volume, nation broadcast "
    "twice under different roles, disjunctive pair predicate.",
    f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3""",
)
def _q7(spark, sf_dir):
    return analytics.q7_volume_shipping(_all(spark, sf_dir))


@_entry(
    "q8_market_share",
    "TPC-H Q8 (adapted): one nation's share of PROMO-part revenue in a "
    "region — conditional numerator over a 7-table join.",
    f"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {_DSUM.format(x="CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
       / {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS mkt_share
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1""",
)
def _q8(spark, sf_dir):
    return analytics.q8_market_share(_all(spark, sf_dir) | {"part": _t(spark, sf_dir, "part")})


@_entry(
    "q9_product_profit",
    "TPC-H Q9 (adapted, no partsupp): profit by supplier nation × year "
    "with a fixed-margin supply-cost stand-in (0.6 × retail).",
    f"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {_DSUM.format(x='l_extendedprice * (1.0 - l_discount) - 0.6 * p_retailprice * l_quantity')} AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2""",
)
def _q9(spark, sf_dir):
    return analytics.q9_product_profit(_all(spark, sf_dir) | {"part": _t(spark, sf_dir, "part")})


@_entry(
    "q12_priority_shipping",
    "TPC-H Q12 (adapted): conditional CASE sums inside one hash agg "
    "(high- vs low-priority line counts per returnflag).",
    """SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag""",
)
def _q12(spark, sf_dir):
    return analytics.q12_priority_shipping(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    )


@_entry(
    "q13_customer_distribution",
    "TPC-H Q13 (adapted): orders-per-customer histogram via LEFT OUTER "
    "join (order-less customers kept as c_count = 0) + two-level agg.",
    """SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count""",
)
def _q13(spark, sf_dir):
    return analytics.q13_customer_distribution(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


@_entry(
    "q15_top_supplier",
    "TPC-H Q15: quarterly revenue view reused for both the scalar MAX and "
    "the equality probe; 1-row max side broadcast.",
    f"""WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)""",
)
def _q15(spark, sf_dir):
    return analytics.q15_top_supplier(
        _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "lineitem")
    )


@_entry(
    "q17_small_quantity_revenue",
    "TPC-H Q17 (adapted): correlated per-part AVG subquery decorrelated "
    "into a grouped agg + join; exact-decimal threshold.",
    f"""WITH per_part AS (
  SELECT l_partkey AS avg_partkey,
         0.2 * {_DSUM.format(x='l_quantity')} / COUNT(*) AS qty_limit
  FROM lineitem GROUP BY 1
)
SELECT {_DSUM.format(x='l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = avg_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < qty_limit""",
)
def _q17(spark, sf_dir):
    return analytics.q17_small_quantity_revenue(
        _t(spark, sf_dir, "part"), _t(spark, sf_dir, "lineitem")
    )


@_entry(
    "q18_large_volume_customers",
    "TPC-H Q18: HAVING SUM(qty) > 300 per order, joined back to "
    "orders/customer; post-filter aggregate is tiny → AQE broadcast.",
    f"""WITH big AS (
  SELECT l_orderkey, {_DSUM.format(x='l_quantity')} AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING {_DSUM.format(x='l_quantity')} > 300.0
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey""",
)
def _q18(spark, sf_dir):
    return analytics.q18_large_volume_customers(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@_entry(
    "q19_disjunctive_revenue",
    "TPC-H Q19 (adapted): three OR-ed brand/size/quantity bands mixing "
    "columns of both join sides; part broadcast.",
    f"""SELECT COALESCE({_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')}, 0.0) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""",
)
def _q19(spark, sf_dir):
    return analytics.q19_disjunctive_revenue(
        _t(spark, sf_dir, "part"), _t(spark, sf_dir, "lineitem")
    )


@_entry(
    "q22_lapsed_customers",
    "TPC-H Q22 (adapted): scalar AVG subquery (1-row broadcast) + LEFT "
    "ANTI join against recent-order custkeys.",
    """WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey""",
)
def _q22(spark, sf_dir):
    return analytics.q22_lapsed_customers(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


# -- events analytics: rollups, windows, sessionization ----------------------

@_entry(
    "events_daily_stats",
    "Day × type rollup: counts, distinct users, exact sums, derived avg.",
    f"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {_DSUM.format(x='value')} AS total_value,
       {_DSUM.format(x='value')} / COUNT(*) AS avg_value
FROM events GROUP BY 1, 2""",
)
def _q_daily(spark, sf_dir):
    return analytics.events_daily_stats(load_events(spark, sf_dir))


# Sessionize output convention (pinned after the r1-r3 red / r4-green saga):
# the oracle's windowed SUM(is_new) yields a HUGEINT session_id in DuckDB —
# a pandas-mediated fetch (duckdb .df()) silently converts HUGEINT to
# float64 ("1.0" vs Spark's "1") — so the session_id is CAST to BIGINT, and
# every ts goes through epoch_us(CAST(ts AS TIMESTAMP)) so a DuckDB reading
# the parquet as TIMESTAMP_NS behaves identically.  (A one-experiment env
# hedge used for diagnosis was removed once the driver row went green.)
_SESS_TS_US = "epoch_us(CAST({x} AS TIMESTAMP))"
_SESS_START = _SESS_TS_US.format(x="MIN(ts)") + " AS session_start"
_SESS_END = _SESS_TS_US.format(x="MAX(ts)") + " AS session_end"


@_entry(
    "events_sessionize",
    "Sessionization: lag → gap>30min flag → running-sum session ids → "
    "per-session aggregates. One shuffle, windows reuse the partitioning.",
    f"""WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG({_SESS_TS_US.format(x='ts')}) OVER w IS NULL
                   OR {_SESS_TS_US.format(x='ts')} - LAG({_SESS_TS_US.format(x='ts')}) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       {_SESS_START},
       {_SESS_END},
       {_DSUM.format(x='value')} AS total_value
FROM sess GROUP BY user_id, session_id""",
)
def _q_sessions(spark, sf_dir):
    return analytics.sessionize(load_events(spark, sf_dir))


@_entry(
    "events_salted_daily_stats",
    "Two-phase salted aggregation (hot-key mitigation): groupBy(day, salt) "
    "partials then merge per day — result bit-identical to the direct "
    "aggregation because the decimal sums are associative.",
    f"""SELECT strftime(ts, '%Y-%m-%d') AS day,
       {_DSUM.format(x='value')} AS total_value,
       CAST(COUNT(value) AS BIGINT) AS value_count
FROM events GROUP BY 1""",
)
def _q_salted_daily(spark, sf_dir):
    from admira_etl_project_prueba_spark.operators.skew import salted_sum_agg

    ev = load_events(spark, sf_dir).select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("value").cast("decimal(25,6)").alias("value_dec"),
        "value",
    )
    out = salted_sum_agg(ev, keys=["day"], sums=["value_dec"], counts=["value"])
    return out.select(
        "day",
        F.col("value_dec").cast("double").alias("total_value"),
        F.col("value_count").cast("long").alias("value_count"),
    )


@_entry(
    "events_moving_avg",
    "Time-series windows over the daily reduction: trailing 7-day moving "
    "average, cumulative sum, day-over-day delta — exact decimal window "
    "arithmetic, double at the edge.",
    """WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         SUM(CAST(value AS DECIMAL(25,6))) AS total_dec
  FROM events GROUP BY 1
)
SELECT day,
       CAST(total_dec AS DOUBLE) AS total_value,
       CAST(SUM(total_dec) OVER trail AS DOUBLE)
         / COUNT(*) OVER trail AS ma7,
       CAST(SUM(total_dec) OVER cum AS DOUBLE) AS cum_value,
       CAST(total_dec - LAG(total_dec, 1) OVER (ORDER BY day) AS DOUBLE) AS day_delta
FROM daily
WINDOW trail AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       cum   AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
)
def _q_moving_avg(spark, sf_dir):
    return analytics.daily_value_moving_avg(load_events(spark, sf_dir))


@_entry(
    "events_cube",
    "CUBE(day-of-week, event_type) + grouping_id: the full subtotal "
    "lattice in one Expand pass / one shuffle.",
    f"""SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow, event_type,
       COUNT(*) AS n_events,
       {_DSUM.format(x='value')} AS total_value,
       CAST(GROUPING(dayofweek(ts) + 1) * 2 + GROUPING(event_type) AS INTEGER) AS gid
FROM events
GROUP BY CUBE(dayofweek(ts) + 1, event_type)""",
)
def _q_cube(spark, sf_dir):
    return analytics.events_cube(load_events(spark, sf_dir))


@_entry(
    "events_percentiles",
    "Exact per-type value percentiles (p50/p90/p99) — swap to "
    "approx_percentile (mergeable t-digest) at extreme scale.",
    """SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY event_type""",
)
def _q_percentiles(spark, sf_dir):
    return analytics.events_value_percentiles(load_events(spark, sf_dir))


@_entry(
    "top_parts_by_nation",
    "Top-3 parts by revenue per supplier nation: aggregate once, rank "
    "with a partitioned window over the reduced rows.",
    f"""WITH rev AS (
  SELECT n_name AS nation, l_partkey AS partkey,
         {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT nation, partkey, revenue,
       ROW_NUMBER() OVER (PARTITION BY nation ORDER BY revenue DESC, partkey) AS rnk
FROM rev QUALIFY rnk <= 3""",
)
def _q_top_parts(spark, sf_dir):
    return analytics.top_parts_by_nation(_all(spark, sf_dir))


@_entry(
    "events_value_correlation",
    "Pearson r of value vs props.k per type via EXACT decimal cross-"
    "moments — reproducible on any cluster size, unlike built-in corr.",
    """WITH base AS (
  SELECT event_type, value AS x,
         CAST(CAST(json_extract(props, '$.k') AS INTEGER) AS DOUBLE) AS y
  FROM events
),
m AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(25,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(25,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(25,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(25,6))) AS DOUBLE) AS syy
  FROM base GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       (CAST(n AS DOUBLE) * sxy - sx * sy)
       / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy))
       AS pearson_r
FROM m""",
)
def _q_correlation(spark, sf_dir):
    return analytics.events_value_correlation(load_events(spark, sf_dir))


@_entry(
    "events_retention_cohorts",
    "Cohort retention matrix: first-activity-day cohorts × day offset × "
    "distinct active users — joins reduced per-user frames, never events.",
    """WITH first AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
),
activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
       CAST(datediff('day', cohort_day, day) AS INTEGER) AS day_n,
       COUNT(DISTINCT user_id) AS n_users
FROM activity JOIN first USING (user_id)
GROUP BY 1, 2""",
)
def _q_retention(spark, sf_dir):
    return analytics.events_retention_cohorts(load_events(spark, sf_dir))


@_entry(
    "events_funnel_ordered",
    "Ordered funnel click → signup → purchase (each step strictly after "
    "the previous step's first occurrence): conditional MINs then "
    "row-local stage predicates.",
    """WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_click) AS reached_click,
       CAST(SUM(CASE WHEN t_click IS NOT NULL AND t_signup > t_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS reached_signup_after_click,
       CAST(SUM(CASE WHEN t_click IS NOT NULL AND t_signup > t_click
                      AND t_purchase > t_signup
                     THEN 1 ELSE 0 END) AS BIGINT) AS reached_full_funnel
FROM per_user""",
)
def _q_funnel_ordered(spark, sf_dir):
    return analytics.events_funnel_ordered(load_events(spark, sf_dir))


@_entry(
    "supplier_revenue_distribution",
    "percent_rank + cume_dist over the per-supplier revenue aggregate — "
    "relative-standing windows on the reduced set.",
    f"""WITH rev AS (
  SELECT s_suppkey, s_name,
         {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name, revenue,
       percent_rank() OVER (ORDER BY revenue DESC) AS pct_rank,
       cume_dist() OVER (ORDER BY revenue DESC) AS cume
FROM rev""",
)
def _q_supplier_dist(spark, sf_dir):
    return analytics.supplier_revenue_distribution(
        _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "lineitem"), exact=True
    )


@_entry(
    "supplier_revenue_distribution_sampled",
    "Scale-safe relative standing: percent_rank/cume_dist become cdf "
    "estimates from a 99-edge approx_percentile grid (1-row broadcast, "
    "row-local arithmetic, no single-partition sort) — the 100 TB form "
    "of supplier_revenue_distribution, and since round 8 the DEFAULT.  "
    "Hash-exact oracle via _gk_edges_cte (GK edges are exact order "
    "statistics at gate SF); grid-vs-rank tolerance additionally pinned "
    "in pytest.",
    f"""WITH rev AS (
  SELECT s_suppkey, s_name,
         {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
),
{_gk_edges_cte('rev', 'revenue', _Q99, 'rk', 'ed')},
cnt AS (
  SELECT r.s_suppkey, COUNT(CASE WHEN r.revenue <= e.v THEN 1 END) AS a
  FROM rev r CROSS JOIN ed e GROUP BY r.s_suppkey
)
SELECT r.s_suppkey, r.s_name, r.revenue,
       CAST(c.a AS DOUBLE) / 99.0 AS pct_rank,
       CAST(c.a + 1 AS DOUBLE) / 100.0 AS cume
FROM rev r JOIN cnt c USING (s_suppkey)""",
)
def _q_supplier_dist_sampled(spark, sf_dir):
    return analytics.supplier_revenue_distribution(
        _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "lineitem"), exact=False
    )


@_entry(
    "events_type_trend",
    "Grouped applyInPandas model fitting: per-type OLS trend over the "
    "JVM-side daily reduction (Python sees days, never events).  Gate "
    "compares 6-decimal-rounded fits vs DuckDB regr_slope/intercept/r2 "
    "(engines agree to ~1e-15 relative; rounding absorbs the float seam "
    "— Spark and DuckDB round(x,6) verified bit-identical over 20k "
    "stress doubles).",
    f"""WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         {_DSUM.format(x='value')} AS total_value
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, total_value,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1
              AS DOUBLE) AS x
  FROM daily
)
SELECT event_type, CAST(COUNT(*) AS INTEGER) AS n_days,
       round(regr_slope(total_value, x), 6) AS slope,
       round(regr_intercept(total_value, x), 6) AS intercept,
       round(regr_r2(total_value, x), 6) AS r2
FROM idx GROUP BY event_type""",
)
def _q_type_trend(spark, sf_dir):
    df = analytics.events_type_trend(load_events(spark, sf_dir))
    return df.select(
        "event_type",
        "n_days",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        F.round("r2", 6).alias("r2"),
    )


@_entry(
    "events_pivot_daily",
    "groupBy().pivot() wide-form day × type counts with declared pivot "
    "values (single-pass plan).",
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error
FROM events GROUP BY 1""",
)
def _q_pivot(spark, sf_dir):
    return analytics.events_pivot_daily(load_events(spark, sf_dir))


@_entry(
    "user_value_quartiles",
    "NTILE(4) over per-user exact totals with deterministic ordering.",
    f"""WITH per_user AS (
  SELECT user_id, {_DSUM.format(x='value')} AS total_value
  FROM events GROUP BY user_id
)
SELECT user_id, total_value,
       CAST(NTILE(4) OVER (ORDER BY total_value DESC, user_id) AS INTEGER) AS quartile
FROM per_user""",
)
def _q_quartiles(spark, sf_dir):
    return analytics.user_value_quartiles(load_events(spark, sf_dir), exact=True)


@_entry(
    "user_value_quartiles_sampled",
    "Scale-safe quartile assignment: approx_percentile edges (mergeable "
    "GK sketch, one aggregate) + 1-row broadcast + row-local bucketing — "
    "no Exchange SinglePartition sort anywhere in the plan (the 100 TB "
    "form of user_value_quartiles, and since round 8 the DEFAULT).  "
    "Hash-exact oracle: below sketch accuracy the GK edges are the "
    "order statistics at rank ceil(p·n) (_gk_edges_cte), so the bucket "
    "fold is exact SQL at gate SF; ±1-bucket parity vs the exact twin "
    "additionally pinned in pytest.",
    f"""WITH per_user AS (
  SELECT user_id, {_DSUM.format(x='value')} AS total_value
  FROM events GROUP BY user_id
),
{_gk_edges_cte('per_user', 'total_value', _Q3, 'rk', 'ed')},
cnt AS (
  SELECT u.user_id, COUNT(CASE WHEN u.total_value <= e.v THEN 1 END) AS a
  FROM per_user u CROSS JOIN ed e GROUP BY u.user_id
)
SELECT u.user_id, u.total_value, CAST(1 + c.a AS INTEGER) AS quartile
FROM per_user u JOIN cnt c USING (user_id)""",
)
def _q_quartiles_sampled(spark, sf_dir):
    return analytics.user_value_quartiles(load_events(spark, sf_dir), exact=False)


@_entry(
    "user_type_overlap",
    "Set-op segmentation: INTERSECT (users with click AND purchase) + "
    "EXCEPT (click but never purchase), labeled.",
    """SELECT user_id, 'both' AS segment FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT user_id, 'a_only' AS segment FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'purchase')""",
)
def _q_overlap(spark, sf_dir):
    return analytics.user_type_overlap(load_events(spark, sf_dir))


@_entry(
    "events_json_props",
    "Semi-structured path: typed from_json parse of the props column, "
    "aggregated by event_type × k-decade bucket.",
    """SELECT event_type,
       CAST(floor(CAST(json_extract(props, '$.k') AS INTEGER) / 10) AS INTEGER) AS k_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events GROUP BY 1, 2""",
)
def _q_json_props(spark, sf_dir):
    return analytics.events_props_stats(load_events(spark, sf_dir))


@_entry(
    "events_approx_distinct",
    "HyperLogLog++ distinct users per type, released as a DETERMINISTIC "
    "bound-check frame: exact count + hll_within_tol flag (1 iff the "
    "sketch estimate is within 10% = 5 sigma of exact).  The sketch is "
    "exercised on the Spark side; the oracle asserts the accuracy "
    "contract holds without hashing the engine-specific estimate.  The "
    "sketch-only production form stays in analytics.events_approx_distinct "
    "(pytest error bound).",
    """SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       COUNT(*) AS n_events,
       CAST(1 AS INTEGER) AS hll_within_tol
FROM events GROUP BY 1""",
)
def _q_approx_distinct(spark, sf_dir):
    return analytics.events_approx_distinct_checked(load_events(spark, sf_dir))


@_entry(
    "events_approx_percentiles",
    "Greenwald-Khanna quantile sketch: approximate p50/p90/p99 of value "
    "per type — mergeable, shuffle flat in row count.  Hash-exact "
    "oracle: the catalog entry pins accuracy=1_000_000, far above any "
    "shipped gate SF's per-type group size (sf0.1 ≈ 20k), so the GK "
    "answers are the order statistics at rank ceil(p·n) per group (the "
    "partitioned form of _gk_edges_cte) at EVERY gate SF; the rank-"
    "error bound at real scale stays pinned in pytest.",
    """WITH rk AS (
  SELECT event_type, value AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
pr AS (SELECT UNNEST(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS p,
              UNNEST([1, 2, 3]) AS i),
ed AS (
  SELECT r.event_type, pr.i, r.v
  FROM pr JOIN rk r ON r.rn = CAST(ceil(pr.p * r.n) AS BIGINT)
),
cnt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1)
SELECT cnt.event_type,
       MAX(CASE WHEN i = 1 THEN v END) AS p50_approx,
       MAX(CASE WHEN i = 2 THEN v END) AS p90_approx,
       MAX(CASE WHEN i = 3 THEN v END) AS p99_approx,
       cnt.n_events
FROM cnt JOIN ed ON cnt.event_type = ed.event_type
GROUP BY cnt.event_type, cnt.n_events""",
)
def _q_approx_percentiles(spark, sf_dir):
    # accuracy pinned ABOVE every shipped testdata group size so the
    # GK-exact rank oracle holds at sf0.001/0.01/0.1 alike (the default
    # 10k accuracy goes inexact — correctly, by its contract — once a
    # group passes 10k rows, which sf0.1 does)
    return analytics.events_approx_percentiles(
        load_events(spark, sf_dir), accuracy=1_000_000
    )


@_entry(
    "events_anomaly_zscore",
    "Daily-volume anomaly flags: per-type day totals z-scored against the "
    "type's own distribution via EXACT decimal moments — two aggregates + "
    "a broadcast join, reproducible on any cluster size.",
    f"""WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         {_DSUM.format(x='value')} AS day_value
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, COUNT(*) AS n_days,
         {_DSUM.format(x='day_value')} AS s1,
         {_DSUM.format(x='day_value * day_value')} AS s2
  FROM daily GROUP BY 1
),
j AS (
  SELECT d.event_type, d.day, d.day_value,
         s1 / n_days AS mean,
         sqrt(greatest(s2 / n_days - (s1 / n_days) * (s1 / n_days), 0.0)) AS std
  FROM daily d JOIN stats USING (event_type)
)
SELECT event_type, day, day_value,
       CASE WHEN std > 0 THEN (day_value - mean) / std END AS zscore,
       abs(COALESCE(CASE WHEN std > 0 THEN (day_value - mean) / std END, 0.0)) > 2.0
         AS is_anomaly
FROM j""",
)
def _q_anomaly_zscore(spark, sf_dir):
    return analytics.events_anomaly_zscore(load_events(spark, sf_dir))


@_entry(
    "events_dau_wau",
    "DAU + trailing-7-day WAU per active day — distinct (user, day) "
    "reduction first, then row-local bin expansion; never a self-join of "
    "the event stream or a full-history window.",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day),
expanded AS (
  SELECT user_id, day + CAST(unnest(range(0, 7)) AS INTEGER) AS day FROM ud
),
wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM expanded GROUP BY day)
SELECT CAST(dau.day AS VARCHAR) AS day,
       CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau
FROM dau JOIN wau ON wau.day = dau.day""",
)
def _q_dau_wau(spark, sf_dir):
    return analytics.events_dau_wau(load_events(spark, sf_dir))


@_entry(
    "top_users_by_value",
    "Global top-50 users by exact total value with row-number ranking.",
    f"""WITH per_user AS (
  SELECT user_id, {_DSUM.format(x='value')} AS total_value
  FROM events GROUP BY user_id
)
SELECT user_id, total_value,
       ROW_NUMBER() OVER (ORDER BY total_value DESC, user_id) AS rnk
FROM per_user
QUALIFY rnk <= 50""",
)
def _q_topusers(spark, sf_dir):
    return analytics.top_users_by_value(load_events(spark, sf_dir))


# ===========================================================================
# Beyond-reference: LLM-data-pipeline operators (dedup, text, similarity,
# multimodal).  Oracle parity notes: md5 is bit-identical across engines;
# HEX60 (first 15 md5 hex chars as int) was verified equal; dot products
# are left-to-right folds in both engines (verified bit-equal).
# ===========================================================================

from admira_etl_project_prueba_spark.operators import multimodal as _mm
from admira_etl_project_prueba_spark.operators import pipeline as _pipe
from admira_etl_project_prueba_spark.operators import similarity as _sim
from admira_etl_project_prueba_spark.operators import textops as _tx


def _duck_hex60(x: str) -> str:
    """DuckDB twin of textops.hex60 (no conv(); fold over hex chars)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(substr(md5({x}), 1, 15), ''), "
        "c -> CAST(strpos('123456789abcdef', c) AS BIGINT))), (a, b) -> a * 16 + b)"
    )


_DUCK_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"


def _duck_bpe_ctes(n_merges: int = 4, materialized: bool = False) -> str:
    """Unrolled DuckDB twin of textops.bpe_learn_merges' trainer loop:
    v0 = vocabulary with char sequences; per round r, p{r} = weighted
    adjacent-pair counts, b{r} = the argmax merge (count desc, lexical
    tie-break), v{r} = sequences rewritten by the doubled-separator
    replace (verified byte-equal to Spark's).

    ``materialized=True`` pins the round CTEs ``AS MATERIALIZED`` —
    required at real depths: each v{r} is referenced twice (by p{r+1}
    and v{r+1}), so DuckDB's default CTE INLINING doubles the plan per
    level — exponential re-evaluation that exhausts file handles near
    depth 64.  Materialization keeps the oracle linear in rounds;
    results are identical either way."""
    kw = "AS MATERIALIZED" if materialized else "AS"
    ctes = [
        f"tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents)",
        "w AS (SELECT unnest(t) AS word FROM tok)",
        f"""v0 {kw} (
  SELECT word, COUNT(*) AS cnt,
         array_to_string(string_split(word, ''), ' ') AS seq
  FROM w WHERE word IS NOT NULL AND word != '' GROUP BY word)""",
    ]
    for r in range(1, n_merges + 1):
        p = f"v{r - 1}"
        ctes += [
            f"""p{r} {kw} (
  SELECT syms[i] AS l, syms[i + 1] AS r, SUM(cnt) AS pair_count
  FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS i
        FROM (SELECT cnt, string_split(seq, ' ') AS syms FROM {p}))
  GROUP BY 1, 2)""",
            f"""b{r} {kw} (
  SELECT l, r, CAST(pair_count AS BIGINT) AS pair_count
  FROM p{r} ORDER BY pair_count DESC, l, r LIMIT 1)""",
            f"""v{r} {kw} (
  SELECT word, cnt,
         CASE WHEN b.l IS NULL THEN seq
              ELSE trim(replace(replace(
                ' ' || replace(seq, ' ', '  ') || ' ',
                ' ' || b.l || '  ' || b.r || ' ',
                ' ' || b.l || b.r || ' '), '  ', ' ')) END AS seq
  FROM {p} LEFT JOIN b{r} b ON TRUE)""",
        ]
    return "WITH " + ",\n".join(ctes)
_DUCK_STOPS = "[" + ", ".join(f"'{w}'" for w in _tx.STOPWORDS) + "]"

_DUCK_SHINGLES = (
    "CASE WHEN len(t) < 3 THEN [] ELSE "
    "list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END"
)
_DUCK_SH = (
    f"list_distinct(list_transform(shingles, s -> {_duck_hex60('s')} % 2147483647))"
)


@_entry(
    "text_token_stats",
    "Per-document token counting (whitespace tokenizer): totals, chars, "
    "unique tokens.  Row-local, shuffle-free.",
    f"""WITH tok AS (SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents)
SELECT doc_id, len(toks) AS n_tokens, length(text) AS n_chars,
       len(list_distinct(toks)) AS n_unique_tokens
FROM tok""",
)
def _q_tokstats(spark, sf_dir):
    return _tx.token_stats(_t(spark, sf_dir, "documents"))


@_entry(
    "text_quality_scores",
    "Quality signals: length, mean token length, type-token ratio, "
    "stopword density.",
    f"""WITH tok AS (SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents)
SELECT doc_id, length(text) AS n_chars, len(toks) AS n_tokens,
       CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) AS mean_token_len,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
       CAST(len(list_filter(toks, t -> list_contains({_DUCK_STOPS}, t))) AS DOUBLE) / len(toks) AS stopword_ratio
FROM tok""",
)
def _q_quality(spark, sf_dir):
    return _tx.quality_scores(_t(spark, sf_dir, "documents"))


def _duck_lang_sql() -> str:
    counts = {
        lang: (
            "len(list_filter(toks, t -> list_contains(["
            + ", ".join(f"'{w}'" for w in words)
            + "], t)))"
        )
        for lang, words in _tx.LANG_MARKERS.items()
    }
    langs = sorted(counts)
    best = "greatest(" + ", ".join(counts[l] for l in langs) + ")"
    pick = "CASE " + " ".join(
        f"WHEN {counts[l]} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return f"""WITH tok AS (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents)
SELECT doc_id, lang AS lang_declared,
       CASE WHEN {best} = 0 THEN 'und' ELSE {pick} END AS lang_predicted,
       {best} AS marker_hits
FROM tok"""


def _duck_lang_parts() -> tuple[str, str]:
    """(best, pick) expressions over a ``toks`` column — DuckDB twin of
    textops.language_id's argmax."""
    counts = {
        lang: (
            "len(list_filter(toks, t -> list_contains(["
            + ", ".join(f"'{w}'" for w in words)
            + "], t)))"
        )
        for lang, words in _tx.LANG_MARKERS.items()
    }
    langs = sorted(counts)
    best = "greatest(" + ", ".join(counts[l] for l in langs) + ")"
    pick = "CASE " + " ".join(
        f"WHEN {counts[l]} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return best, pick


@_entry(
    "dedup_incremental",
    "Growing-corpus dedup: batch-internal first-survivor + anti-join vs "
    "the seen-hash store (32 bytes/doc; text never shuffles).  Seen set = "
    "docs < 100, new batch = docs ≥ 100.",
    """WITH hashed AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash
  FROM documents
),
seen AS (SELECT DISTINCT content_hash FROM hashed WHERE doc_id < 100),
newdocs AS (SELECT * FROM hashed WHERE doc_id >= 100),
surv AS (SELECT content_hash, MIN(doc_id) AS doc_id FROM newdocs GROUP BY 1)
SELECT n.doc_id, n.content_hash
FROM newdocs n
JOIN surv s ON n.content_hash = s.content_hash AND n.doc_id = s.doc_id
WHERE NOT EXISTS (SELECT 1 FROM seen WHERE seen.content_hash = n.content_hash)""",
)
def _q_dedup_incr(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    seen = _tx.fingerprints(docs.filter(F.col("doc_id") < 100)).select(
        F.col("md5_normalized").alias("content_hash")
    )
    out = _tx.dedup_incremental(docs.filter(F.col("doc_id") >= 100), seen)
    return out.select("doc_id", "content_hash")


def _duck_quality_filter_sql() -> str:
    best, pick = _duck_lang_parts()
    lang = f"CASE WHEN {best} = 0 THEN 'und' ELSE {pick} END"
    return f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
q AS (
  SELECT doc_id, len(toks) AS n_tokens,
         CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks) AS mean_token_len,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
         CAST(len(list_filter(toks, t -> list_contains({_DUCK_STOPS}, t))) AS DOUBLE) / len(toks) AS stopword_ratio,
         {lang} AS lang_predicted
  FROM tok
),
r AS (
  SELECT *, CASE WHEN n_tokens < 5 THEN 'too_short'
                 WHEN n_tokens > 100000 THEN 'too_long'
                 WHEN mean_token_len < 2.0 THEN 'tokens_too_short'
                 WHEN mean_token_len > 12.0 THEN 'tokens_too_long'
                 WHEN stopword_ratio < 0.0 THEN 'unnatural_text'
                 WHEN NOT list_contains(['en', 'es', 'de', 'fr'], lang_predicted)
                   THEN 'lang_not_allowed'
            END AS reject_reason
  FROM q
)
SELECT doc_id, n_tokens, mean_token_len, ttr, stopword_ratio, lang_predicted,
       reject_reason IS NULL AS kept, reject_reason
FROM r"""


@_entry(
    "corpus_quality_filter",
    "Composed cleaning stage: quality heuristics + language allow-list → "
    "kept verdict + first-match reject_reason, one row-local pass.",
    _duck_quality_filter_sql(),
)
def _q_quality_filter(spark, sf_dir):
    return _tx.quality_filter(
        _t(spark, sf_dir, "documents"), langs=("en", "es", "de", "fr")
    )


@_entry(
    "text_language_id",
    "Marker-lexicon language ID with deterministic argmax tie-break.",
    _duck_lang_sql(),
)
def _q_langid(spark, sf_dir):
    return _tx.language_id(_t(spark, sf_dir, "documents"))


@_entry(
    "source_reputation",
    "C4-style source-level curation: per-source quality-verdict rollup "
    "(kept fraction, exact decimal means, deterministic dominant "
    "language) + a keep_source verdict — removes bad domains wholesale. "
    "Narrow verdict rows shuffle on source; text never moves.",
    f"""WITH qf AS ({_duck_quality_filter_sql()}),
d AS (
  SELECT COALESCE(s.source, '(unknown)') AS source, q.doc_id, q.n_tokens,
         q.ttr, q.stopword_ratio, q.lang_predicted, q.kept
  FROM qf q JOIN documents s ON s.doc_id = q.doc_id
),
per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         {_DSUM.format(x='ttr')} / COUNT(*) AS mean_ttr,
         {_DSUM.format(x='stopword_ratio')} / COUNT(*) AS mean_stopword_ratio
  FROM d GROUP BY source
),
dom AS (
  SELECT source, lang_predicted AS dominant_lang
  FROM (
    SELECT source, lang_predicted,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY COUNT(*) DESC, lang_predicted) AS rn
    FROM d GROUP BY source, lang_predicted
  ) WHERE rn = 1
)
SELECT p.source, n_docs, n_kept,
       CAST(n_kept AS DOUBLE) / n_docs AS kept_fraction,
       total_tokens, mean_ttr, mean_stopword_ratio, dominant_lang,
       CAST(n_kept AS DOUBLE) / n_docs >= 0.5 AS keep_source
FROM per p JOIN dom USING (source)""",
)
def _q_source_reputation(spark, sf_dir):
    return _tx.source_reputation(_t(spark, sf_dir, "documents"))


@_entry(
    "doc_fingerprints",
    "Exact-dup fingerprints: raw + normalized md5 (case/whitespace folded).",
    """SELECT doc_id, md5(text) AS md5_raw,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS md5_normalized,
       length(text) AS n_chars
FROM documents""",
)
def _q_fprint(spark, sf_dir):
    return _tx.fingerprints(_t(spark, sf_dir, "documents"))


def _duck_simhash_sql(bits: int = 60) -> str:
    terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(h, x -> (x >> {j}) & 1 = 1)) > len(h) "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    return f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
hs AS (SELECT doc_id, list_transform(toks, t -> {_duck_hex60('t')}) AS h FROM tok)
SELECT doc_id, {terms} AS simhash FROM hs"""


@_entry(
    "simhash_fingerprints",
    "60-bit SimHash (per-bit majority vote over md5-derived token hashes) "
    "— near-dup docs land within small hamming distance.  Row-local, no "
    "shuffle.",
    _duck_simhash_sql(),
)
def _q_simhash(spark, sf_dir):
    return _tx.simhash64(_t(spark, sf_dir, "documents"))


def _duck_minhash_sql(num_perm: int = 16) -> str:
    ms, perms = [], []
    for p in range(num_perm):
        a, b = 2 * p + 1, 1000 * p + 7
        ms.append(
            f"coalesce(list_min(list_transform(sh, h -> ({a} * h + {b}) % 2147483647)), "
            f"2147483647)"
        )
        perms.append(str(p))
    return f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sg AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM tok),
sh AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg)
SELECT doc_id, unnest([{", ".join(perms)}]) AS perm,
       unnest([{", ".join(ms)}]) AS minhash
FROM sh"""


@_entry(
    "minhash_signatures",
    "MinHash signatures (16 affine permutations over 3-token shingle "
    "hashes) — the LSH building block, computed row-locally.",
    _duck_minhash_sql(),
)
def _q_minhash(spark, sf_dir):
    return _tx.minhash_signatures(_t(spark, sf_dir, "documents"))


@_entry(
    "tfidf_top_terms",
    "Per-document top-5 characteristic terms by tf × (N/df) — linear-idf "
    "TF-IDF (ln is libm-dependent across engines; the rational form is "
    "exact and induces the same ranking).",
    f"""WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT token, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY 1),
n_docs AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
scored AS (
  SELECT doc_id, tf.token, tf, df, tf * (CAST(n AS DOUBLE) / df) AS score
  FROM tf JOIN dfreq ON tf.token = dfreq.token, n_docs
)
SELECT doc_id, token, tf, df, score,
       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
FROM scored QUALIFY rnk <= 5""",
)
def _q_tfidf(spark, sf_dir):
    return _tx.tfidf_top_terms(_t(spark, sf_dir, "documents"))


@_entry(
    "text_repetition_scores",
    "Intra-document repetition (Gopher/C4 quality family): duplicated "
    "token and 3-gram fractions — row-local, shuffle-free.",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sg AS (SELECT doc_id, t, {_DUCK_SHINGLES} AS sg FROM tok)
SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(sg) AS BIGINT) AS n_shingles,
       CASE WHEN len(t) > 0 THEN
         1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) END AS dup_token_frac,
       CASE WHEN len(sg) > 0 THEN
         1.0 - CAST(len(list_distinct(sg)) AS DOUBLE) / len(sg) END AS dup_shingle_frac
FROM sg""",
)
def _q_repetition(spark, sf_dir):
    return _tx.repetition_scores(_t(spark, sf_dir, "documents"))


def _duck_shingles_k(k: int) -> str:
    chain = " || ' ' || ".join(f"t[i+{d}]" for d in range(k))
    return (
        f"CASE WHEN len(t) < {k} THEN [] ELSE "
        f"list_transform(range(1, len(t) - {k - 2}), i -> {chain}) END"
    )


@_entry(
    "decontaminate",
    "Benchmark decontamination: training docs (doc_id%50<>0) sharing any "
    "8-token shingle with the eval split (doc_id%50=0) are flagged; the "
    "eval side's hashes are broadcast, corpus text never shuffles.",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sg AS (SELECT doc_id, {_duck_shingles_k(8)} AS shingles FROM tok),
shs AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg),
bench AS (SELECT DISTINCT unnest(sh) AS h FROM shs WHERE doc_id % 50 = 0),
hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM (SELECT doc_id, unnest(sh) AS h FROM shs WHERE doc_id % 50 <> 0)
  WHERE h IN (SELECT h FROM bench)
  GROUP BY doc_id
)
SELECT d.doc_id, coalesce(n_overlap, 0) AS n_overlap,
       coalesce(n_overlap, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
WHERE d.doc_id % 50 <> 0""",
)
def _q_decontaminate(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return _tx.decontaminate(
        docs.filter("doc_id % 50 != 0"), docs.filter("doc_id % 50 = 0"), k=8
    )


@_entry(
    "profile_documents",
    "One-pass column profiler over documents: row count, non-null count, "
    "exact distinct, lexicographic string min/max — single scan, single "
    "aggregate for all columns.",
    """WITH p AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(doc_id) AS nn_doc_id, COUNT(DISTINCT doc_id) AS nd_doc_id,
         MIN(CAST(doc_id AS VARCHAR)) AS mn_doc_id, MAX(CAST(doc_id AS VARCHAR)) AS mx_doc_id,
         COUNT(text) AS nn_text, COUNT(DISTINCT text) AS nd_text,
         MIN(text) AS mn_text, MAX(text) AS mx_text,
         COUNT(lang) AS nn_lang, COUNT(DISTINCT lang) AS nd_lang,
         MIN(lang) AS mn_lang, MAX(lang) AS mx_lang
  FROM documents
)
SELECT 'doc_id' AS column, n_rows, nn_doc_id AS n_nonnull, nd_doc_id AS n_distinct,
       mn_doc_id AS min_str, mx_doc_id AS max_str FROM p
UNION ALL
SELECT 'text', n_rows, nn_text, nd_text, mn_text, mx_text FROM p
UNION ALL
SELECT 'lang', n_rows, nn_lang, nd_lang, mn_lang, mx_lang FROM p""",
)
def _q_profile(spark, sf_dir):
    from admira_etl_project_prueba_spark.operators.profile import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "documents"), columns=["doc_id", "text", "lang"]
    )


@_entry(
    "chunk_documents",
    "Overlapping token-window chunking (size 64, overlap 16) — the "
    "RAG/pretraining prep step; row-local explode, no shuffle.",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
st AS (
  SELECT doc_id, t,
         unnest(CASE WHEN len(t) = 0 THEN [1]
                     ELSE range(1, len(t) + 1, 48) END) AS start,
         generate_subscripts(CASE WHEN len(t) = 0 THEN [1]
                     ELSE range(1, len(t) + 1, 48) END, 1) - 1 AS chunk_id
  FROM tok
)
SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
       CAST(start AS INTEGER) AS start,
       len(list_slice(t, start, start + 63)) AS n_tokens,
       array_to_string(list_slice(t, start, start + 63), ' ') AS chunk_text
FROM st""",
)
def _q_chunks(spark, sf_dir):
    df = _tx.chunk_documents(_t(spark, sf_dir, "documents"))
    return df.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start").cast("int").alias("start"),
        "n_tokens",
        "chunk_text",
    )


@_entry(
    "sequence_pack",
    "LLM sequence packing: deterministic token-stream layout, each doc "
    "assigned the 512-token bin holding its per-shard starting offset "
    "(exact integer window cumsum, window keyed by doc_id-range shard "
    "so the cumsum parallelizes).",
    f"""WITH toks AS (
  SELECT doc_id, CAST(floor(doc_id / 128) AS BIGINT) AS shard,
         len({_DUCK_TOKS}) AS n_tokens
  FROM documents)
SELECT doc_id, shard, n_tokens,
       CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS start_offset,
       CAST(floor((SUM(n_tokens) OVER w - n_tokens) / 512) AS BIGINT) AS pack_id
FROM toks
WINDOW w AS (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
)
def _q_seq_pack(spark, sf_dir):
    # docs_per_shard sized so the sf-scale fixture exercises several shards
    return _tx.sequence_pack(_t(spark, sf_dir, "documents"), docs_per_shard=128)


@_entry(
    "train_test_split",
    "Deterministic hash-based train/test split (md5 of id+salt mod 100): "
    "assignment never migrates as the corpus grows — the leakage-safe "
    "split primitive.",
    f"""SELECT doc_id, lang,
       CASE WHEN {_duck_hex60("doc_id || '_' || 'v1'")} % 100 < 80
            THEN 'train' ELSE 'test' END AS split
FROM documents""",
)
def _q_split(spark, sf_dir):
    return _tx.train_test_split(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "split"
    )


@_entry(
    "stratified_sample",
    "Per-stratum deterministic sampling — the data-mixture rebalancing "
    "stage.  Membership = engine-portable md5 bucket of (doc_id, seed) "
    "under the stratum's fraction (train_test_split recipe per stratum), "
    "so the sample is hash-exact-reproducible on any engine; unlisted/"
    "NULL strata drop (sampleBy parity); binomial marginals pinned in "
    "pytest.",
    f"""SELECT doc_id, lang
FROM documents
WHERE {_duck_hex60("doc_id || '_strat' || '42'")} % 10000 <
      CASE lang WHEN 'en' THEN 3000 WHEN 'es' THEN 6000 ELSE 0 END""",
)
def _q_strat_sample(spark, sf_dir):
    return _tx.stratified_sample(
        _t(spark, sf_dir, "documents"), fractions={"en": 0.3, "es": 0.6}
    ).select("doc_id", "lang")


@_entry(
    "mixture_sample",
    "Deterministic data-mixture sampling: per-source keep rates applied "
    "via the engine-portable md5 bucket of (doc_id, salt) — the mixture "
    "is reproducible on any engine/run/cluster (unlike sampleBy's RNG), "
    "so it's exact-oracle-able; rate map is a broadcast left-join, "
    "default rate covers unlisted/NULL sources.",
    f"""SELECT doc_id, source
FROM documents
WHERE {_duck_hex60("doc_id || '_' || 'mix1'")} % 10000 <
      CASE source WHEN 'src0' THEN 2500 WHEN 'src1' THEN 5000
                  WHEN 'src2' THEN 0 ELSE 10000 END""",
)
def _q_mixture_sample(spark, sf_dir):
    return _tx.mixture_sample(
        _t(spark, sf_dir, "documents"),
        rates={"src0": 0.25, "src1": 0.5, "src2": 0.0},
    ).select("doc_id", "source")


@_entry(
    "dsir_importance_weights",
    "DSIR importance weights (Xie et al. 2023): per-doc hashed-bigram "
    "log-likelihood ratio of the target domain (lang='en') vs the source "
    "pool, add-one smoothed over 4096 buckets.  Per-BUCKET log-ratio "
    "rounded to the decimal grid before the per-doc Σ c·ratio keeps the "
    "ln surface hash-oracle-able; bucket dists broadcast, text never "
    "shuffles.",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sf AS (
  SELECT doc_id, {_duck_hex60("bg")} % 4096 AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i + 1])) AS bg
    FROM tok WHERE len(t) >= 2
  ) GROUP BY doc_id, b
),
tf AS (
  SELECT b, SUM(c) AS t_cnt
  FROM sf JOIN documents USING (doc_id)
  WHERE lang = 'en' GROUP BY b
),
sc AS (SELECT b, SUM(c) AS s_cnt FROM sf GROUP BY b),
tots AS (SELECT (SELECT SUM(c) FROM sf) AS s_tot,
                (SELECT SUM(c) FROM sf JOIN documents USING (doc_id)
                 WHERE lang = 'en') AS t_tot),
dist AS (
  SELECT b,
         CAST(round(ln((COALESCE(t_cnt, 0) + 1) / CAST(t_tot + 4096 AS DOUBLE))
               - ln((s_cnt + 1) / CAST(s_tot + 4096 AS DOUBLE)), 6)
              AS DECIMAL(25,6)) AS log_ratio
  FROM sc LEFT JOIN tf USING (b), tots
),
w AS (
  SELECT doc_id, SUM(c * log_ratio) AS w, CAST(SUM(c) AS BIGINT) AS n_bigrams
  FROM sf JOIN dist USING (b) GROUP BY doc_id
)
SELECT d.doc_id, CAST(w.w AS DOUBLE) AS log_weight,
       COALESCE(w.n_bigrams, 0) AS n_bigrams
FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id""",
)
def _q_dsir_weights(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return _tx.dsir_importance_weights(docs, docs.filter("lang = 'en'"))


@_entry(
    "token_budget_sample",
    "Deterministic per-source TOKEN-budget sampling: each source keeps a "
    "stable md5-ranked prefix of docs whose cumulative tokens fit its "
    "budget (src0: 500 tokens, src1: uncapped-by-size, others: default "
    "800).  Budget map broadcast; one running-sum window per source.",
    f"""WITH base AS (
  SELECT COALESCE(source, '{_tx.UNKNOWN_SOURCE}') AS source, doc_id,
         CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens,
         {_duck_hex60("doc_id || '_' || 'budget1'")} AS rank
  FROM documents
),
cum AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY rank, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens,
         CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 100000
              ELSE 800 END AS budget
  FROM base
)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM cum WHERE cum_tokens <= budget""",
)
def _q_token_budget(spark, sf_dir):
    return _tx.token_budget_sample(
        _t(spark, sf_dir, "documents"),
        budgets={"src0": 500, "src1": 100000},
        default_budget=800,
    )


@_entry(
    "token_frequencies",
    "Vocabulary building: global token counts + document frequency, "
    "deterministic top-100 (map-side partial agg ⇒ shuffle carries vocab "
    "cardinality, not corpus tokens).",
    f"""WITH toks AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
)
SELECT token, COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS doc_frequency
FROM toks GROUP BY token
ORDER BY n_occurrences DESC, token LIMIT 100""",
)
def _q_token_freq(spark, sf_dir):
    return _tx.token_frequencies(_t(spark, sf_dir, "documents"))


@_entry(
    "bigram_frequencies",
    "N-gram LM statistics: global bigram counts + document frequency, "
    "deterministic top-100 — row-local 2-gram projection, same "
    "vocab-cardinality shuffle shape as token_frequencies.",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
bg AS (
  SELECT doc_id, unnest(
    CASE WHEN len(t) < 2 THEN []
         ELSE list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) END
  ) AS bigram
  FROM tok
)
SELECT bigram, COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS doc_frequency
FROM bg GROUP BY bigram
ORDER BY n_occurrences DESC, bigram LIMIT 100""",
)
def _q_bigram_freq(spark, sf_dir):
    return _tx.bigram_frequencies(_t(spark, sf_dir, "documents"))


@_entry(
    "dedup_exact",
    "Exact dedup by md5 content hash: surviving doc + duplicate count per "
    "distinct text.  Shuffles 32-byte hashes, never documents.",
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1""",
)
def _q_dedup_exact(spark, sf_dir):
    return _tx.dedup_exact(_t(spark, sf_dir, "documents"))


@_entry(
    "dedup_exact_normalized",
    "Exact dedup after case/whitespace normalization.",
    """SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash,
       MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1""",
)
def _q_dedup_norm(spark, sf_dir):
    return _tx.dedup_exact(_t(spark, sf_dir, "documents"), normalized=True)


def _duck_lsh_pairs_sql(num_perm: int = 16) -> str:
    return f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sg AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM tok),
shs AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg),
sig AS ({_duck_minhash_sql(num_perm).split('SELECT doc_id, unnest')[0]}
        SELECT doc_id, unnest({'[' + ', '.join(str(p) for p in range(num_perm)) + ']'}) AS perm,
               unnest([{", ".join(f"coalesce(list_min(list_transform(sh, h -> ({2*p+1} * h + {1000*p+7}) % 2147483647)), 2147483647)" for p in range(num_perm))}]) AS minhash
        FROM sh),
bands AS (
  SELECT doc_id, perm // 2 AS band,
         MIN(minhash) AS lo, MAX(minhash) AS hi, SUM(minhash) AS s
  FROM sig GROUP BY doc_id, perm // 2
),
bkt AS (SELECT doc_id, concat_ws('_', band, lo, hi, s) AS bucket FROM bands),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bkt a JOIN bkt b USING (bucket)
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE) /
       (len(sa.sh) + len(sb.sh) - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))) AS jaccard
FROM cand
JOIN shs sa ON sa.doc_id = cand.doc_a
JOIN shs sb ON sb.doc_id = cand.doc_b
WHERE len(sa.sh) + len(sb.sh) > 0"""


@_entry(
    "lsh_near_dup_pairs",
    "MinHash-LSH near-dup candidate pairs (2-row bands) with exact "
    "Jaccard verification on shingle sets.",
    _duck_lsh_pairs_sql(),
)
def _q_lsh_pairs(spark, sf_dir):
    return _tx.lsh_candidate_pairs(_t(spark, sf_dir, "documents"))


def _duck_lsh_incremental_sql(num_perm: int = 16) -> str:
    """Incremental-LSH oracle: corpus = doc_id%10<8, batch = doc_id%10>=8;
    pairs run corpus→batch only (within-batch is lsh_near_dup_pairs')."""
    return f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sg AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM tok),
shs AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg),
sig AS (
        SELECT doc_id, unnest({'[' + ', '.join(str(p) for p in range(num_perm)) + ']'}) AS perm,
               unnest([{", ".join(f"coalesce(list_min(list_transform(sh, h -> ({2*p+1} * h + {1000*p+7}) % 2147483647)), 2147483647)" for p in range(num_perm))}]) AS minhash
        FROM shs),
bands AS (
  SELECT doc_id, perm // 2 AS band,
         MIN(minhash) AS lo, MAX(minhash) AS hi, SUM(minhash) AS s
  FROM sig GROUP BY doc_id, perm // 2
),
bkt AS (SELECT doc_id, concat_ws('_', band, lo, hi, s) AS bucket FROM bands),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bkt a JOIN bkt b USING (bucket)
  WHERE a.doc_id % 10 < 8 AND b.doc_id % 10 >= 8
)
SELECT doc_a, doc_b,
       CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE) /
       (len(sa.sh) + len(sb.sh) - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))) AS jaccard
FROM cand
JOIN shs sa ON sa.doc_id = cand.doc_a
JOIN shs sb ON sb.doc_id = cand.doc_b
WHERE len(sa.sh) + len(sb.sh) > 0"""


@_entry(
    "lsh_incremental_pairs",
    "Incremental near-dup: a new batch (doc_id%10>=8) LSH-joined against a "
    "persisted signature store of the existing corpus — signatures computed "
    "once, store never shuffled, batch broadcast.",
    _duck_lsh_incremental_sql(),
)
def _q_lsh_incremental(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # the store recomputes here (no persisted snapshot in the gate run);
    # its internal repartition is the exchange both store passes reuse
    store = _tx.lsh_signature_store(docs.filter("doc_id % 10 < 8"))
    return _tx.lsh_incremental_pairs(docs.filter("doc_id % 10 >= 8"), store)


@_entry(
    "simhash_near_dup_pairs",
    "SimHash near-dup pairs: pigeonhole banding (4×15-bit bands) → "
    "equi-join candidates → exact popcount verify (hamming ≤ 3).",
    f"""WITH sim AS ({_duck_simhash_sql()}),
bands AS (
  SELECT doc_id, simhash, b.band AS band, (simhash >> (15 * b.band)) & 32767 AS val
  FROM sim, (SELECT unnest([0, 1, 2, 3]) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3""",
)
def _q_simhash_pairs(spark, sf_dir):
    df = _tx.simhash_near_dup_pairs(_t(spark, sf_dir, "documents"))
    return df.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


@_entry(
    "ngram_jaccard_pairs",
    "Exact n-gram (3-token shingle) Jaccard pairs over a bounded candidate "
    "universe — the brute-force baseline the MinHash-LSH path approximates.",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents WHERE doc_id < 500),
sg AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM tok),
shs AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sa, b.sh AS sb
  FROM shs a JOIN shs b ON a.doc_id < b.doc_id
  WHERE len(a.sh) + len(b.sh) > 0
)
SELECT doc_a, doc_b,
       CAST(len(list_filter(sa, x -> list_contains(sb, x))) AS DOUBLE) /
       (len(sa) + len(sb) - len(list_filter(sa, x -> list_contains(sb, x)))) AS jaccard
FROM pairs
WHERE CAST(len(list_filter(sa, x -> list_contains(sb, x))) AS DOUBLE) /
      (len(sa) + len(sb) - len(list_filter(sa, x -> list_contains(sb, x)))) > 0.2""",
)
def _q_ngram_jaccard(spark, sf_dir):
    return _tx.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


from admira_etl_project_prueba_spark.operators import graph as _graph


_DEDUP_CLUSTERS_SQL = f"""WITH RECURSIVE lshp AS ({_duck_lsh_pairs_sql()}),
strong AS (SELECT doc_a, doc_b FROM lshp WHERE jaccard > 0.5),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM strong
  UNION
  SELECT doc_b AS a, doc_a AS b FROM strong
),
walk(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, w.label FROM walk w JOIN edges e ON e.b = w.node
),
cc AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node)
SELECT d.doc_id,
       COALESCE(cc.component, d.doc_id) AS component,
       COALESCE(cc.component, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN cc ON d.doc_id = cc.node"""


@_entry(
    "dedup_clusters",
    "Transitive closure of near-dup pairs (iterative min-label propagation "
    "= connected components) electing one survivor per duplicate group — "
    "oracle is a DuckDB recursive CTE over the same LSH edges.",
    _DEDUP_CLUSTERS_SQL,
)
def _q_dedup_clusters(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return _graph.dedup_clusters(docs, _tx.lsh_candidate_pairs(docs))


@_entry(
    "dedup_clusters_star",
    "Identical clustering via the alternating large-star/small-star "
    "algorithm (Kiveris et al., SoCC'14): O(log^2 n) rounds independent "
    "of cluster diameter — the extreme-scale inner loop.  Shares the "
    "recursive-CTE oracle (same output contract).",
    _DEDUP_CLUSTERS_SQL,
)
def _q_dedup_clusters_star(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return _graph.dedup_clusters(
        docs, _tx.lsh_candidate_pairs(docs), algorithm="star"
    )


@_entry(
    "dedup_best_survivors",
    "Quality-aware survivor election: longest doc (ties → smallest id) "
    "survives each near-dup cluster — one window over component.",
    f"""WITH RECURSIVE lshp AS ({_duck_lsh_pairs_sql()}),
strong AS (SELECT doc_a, doc_b FROM lshp WHERE jaccard > 0.5),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM strong
  UNION
  SELECT doc_b AS a, doc_a AS b FROM strong
),
walk(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, w.label FROM walk w JOIN edges e ON e.b = w.node
),
cc AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
assigned AS (
  SELECT d.doc_id, COALESCE(cc.component, d.doc_id) AS component
  FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
),
tok AS (
  SELECT doc_id, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens FROM documents
)
SELECT a.doc_id, a.component, t.n_tokens,
       ROW_NUMBER() OVER (
         PARTITION BY a.component ORDER BY t.n_tokens DESC, a.doc_id
       ) = 1 AS keep
FROM assigned a JOIN tok t ON t.doc_id = a.doc_id""",
)
def _q_dedup_best_survivors(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return _graph.dedup_best_survivors(docs, _tx.lsh_candidate_pairs(docs))


def _duck_training_corpus_sql() -> str:
    """The full pipeline composition: quality → LSH on kept docs →
    clusters → longest-survivor → split → per-doc status."""
    lsh_on_kept = _duck_lsh_pairs_sql().replace("FROM documents", "FROM kept_docs")
    return f"""WITH RECURSIVE
qf AS ({_duck_quality_filter_sql()}),
kept_docs AS (
  SELECT d.* FROM documents d JOIN qf ON qf.doc_id = d.doc_id AND qf.kept
),
lshp AS ({lsh_on_kept}),
strong AS (SELECT doc_a, doc_b FROM lshp WHERE jaccard > 0.5),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM strong
  UNION
  SELECT doc_b AS a, doc_a AS b FROM strong
),
walk(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, w.label FROM walk w JOIN edges e ON e.b = w.node
),
cc AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
assigned AS (
  SELECT k.doc_id, COALESCE(cc.component, k.doc_id) AS component
  FROM kept_docs k LEFT JOIN cc ON k.doc_id = cc.node
),
tok2 AS (
  SELECT doc_id, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens FROM kept_docs
),
surv AS (
  SELECT a.doc_id, a.component,
         ROW_NUMBER() OVER (
           PARTITION BY a.component ORDER BY t.n_tokens DESC, a.doc_id
         ) = 1 AS survivor
  FROM assigned a JOIN tok2 t ON t.doc_id = a.doc_id
),
splt AS (
  SELECT doc_id,
         CASE WHEN {_duck_hex60("doc_id || '_' || 'v1'")} % 100 < 80
              THEN 'train' ELSE 'test' END AS split
  FROM documents
)
SELECT q.doc_id, q.kept AS kept_quality, q.reject_reason,
       s.component, s.survivor,
       CASE WHEN NOT q.kept THEN 'rejected_quality'
            WHEN NOT s.survivor THEN 'dup_removed'
            ELSE sp.split END AS status
FROM qf q
LEFT JOIN surv s ON s.doc_id = q.doc_id
JOIN splt sp ON sp.doc_id = q.doc_id"""


@_entry(
    "build_training_corpus",
    "Flagship pipeline composition: quality filter → near-dup clustering "
    "on the clean subset → longest-survivor election → leakage-safe split "
    "— one auditable status verdict per input document.",
    _duck_training_corpus_sql(),
)
def _q_training_corpus(spark, sf_dir):
    return _pipe.build_training_corpus(_t(spark, sf_dir, "documents"))


# -- similarity search -------------------------------------------------------

_DUCK_VD = "embedding::DOUBLE[] "


def _duck_dot(a: str, b: str) -> str:
    return f"list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"


def _duck_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform(range(1, 65), i -> {a}[i] * {a}[i])))"


@_entry(
    "ann_cosine_topk",
    "Exact brute-force cosine top-10 vs stored vector 0 (broadcast query, "
    "row-local fold, TakeOrdered).",
    f"""WITH t AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM embeddings),
q AS (SELECT v AS q FROM t WHERE vec_id = 0),
scored AS (
  SELECT vec_id, label,
         CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('v')} > 0
              THEN {_duck_dot('q', 'v')} / ({_duck_norm('q')} * {_duck_norm('v')})
              ELSE 0.0 END AS cosine
  FROM t, q WHERE vec_id <> 0
)
SELECT * FROM scored ORDER BY cosine DESC, vec_id LIMIT 10""",
)
def _q_ann_topk(spark, sf_dir):
    return _sim.cosine_topk(_t(spark, sf_dir, "embeddings"))


@_entry(
    "ann_cosine_topk_batch",
    "Batch ANN: top-5 neighbors for each of the first 8 vectors "
    "(window top-k per query).",
    f"""WITH t AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS q FROM t WHERE vec_id < 8),
scored AS (
  SELECT query_id, vec_id,
         CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('v')} > 0
              THEN {_duck_dot('q', 'v')} / ({_duck_norm('q')} * {_duck_norm('v')})
              ELSE 0.0 END AS cosine
  FROM t, q WHERE vec_id <> query_id
)
SELECT query_id, vec_id, cosine,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
FROM scored QUALIFY rnk <= 5""",
)
def _q_ann_batch(spark, sf_dir):
    return _sim.cosine_topk_batch(_t(spark, sf_dir, "embeddings"))


_DUCK_PLANE = (
    "((((1103515245 * CAST(({i} * 64 + j) AS BIGINT) + 12345) % 2001) + 2001) % 2001"
    " - 1000) / 1000.0"
)


def _duck_bucket(vec: str, n_planes: int = 8) -> str:
    bits = []
    for i in range(n_planes):
        dot = (
            f"list_sum(list_transform(range(1, 65), "
            f"j -> {vec}[j] * ({_DUCK_PLANE.format(i=i)})))"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)")
    return " + ".join(bits)


@_entry(
    "ann_lsh_buckets",
    "Random-hyperplane LSH bucket assignment (deterministic LCG planes) — "
    "row-local; the scale path writes the table bucketed by this column.",
    f"""WITH t AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM embeddings)
SELECT vec_id, label, {_duck_bucket('v')} AS bucket FROM t""",
)
def _q_lsh_buckets(spark, sf_dir):
    return _sim.lsh_buckets(_t(spark, sf_dir, "embeddings"))


@_entry(
    "ann_lsh_topk",
    "Approximate top-10 via LSH bucket probe: score only the query's "
    "bucket (~corpus/2^8 candidates), exact cosine within.",
    f"""WITH t AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM embeddings),
tb AS (SELECT vec_id, label, v, {_duck_bucket('v')} AS bucket FROM t),
q AS (SELECT v AS q, bucket AS qbucket FROM tb WHERE vec_id = 0),
scored AS (
  SELECT vec_id, label, bucket,
         CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('v')} > 0
              THEN {_duck_dot('q', 'v')} / ({_duck_norm('q')} * {_duck_norm('v')})
              ELSE 0.0 END AS cosine
  FROM tb, q WHERE bucket = qbucket AND vec_id <> 0
)
SELECT * FROM scored ORDER BY cosine DESC, vec_id LIMIT 10""",
)
def _q_lsh_topk(spark, sf_dir):
    return _sim.lsh_topk(_t(spark, sf_dir, "embeddings"))


@_entry(
    "ann_lsh_topk_multiprobe",
    "Multi-probe LSH: probe the query bucket plus its Hamming-1 "
    "neighborhood (one flip per plane) — the recall/cost dial when "
    "bucketing is fixed at write time.",
    f"""WITH t AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM embeddings),
tb AS (SELECT vec_id, label, v, {_duck_bucket('v')} AS bucket FROM t),
q AS (SELECT v AS q, bucket AS qb FROM tb WHERE vec_id = 0),
probes AS (
  SELECT DISTINCT unnest(list_prepend(qb,
           list_transform(range(0, 8), i -> xor(qb, CAST(1 AS BIGINT) << i)))) AS probe
  FROM q
),
scored AS (
  SELECT tb.vec_id, tb.label, tb.bucket,
         CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('v')} > 0
              THEN {_duck_dot('q', 'v')} / ({_duck_norm('q')} * {_duck_norm('v')})
              ELSE 0.0 END AS cosine
  FROM tb, q
  WHERE tb.bucket IN (SELECT probe FROM probes) AND tb.vec_id <> 0
)
SELECT vec_id, label, bucket, cosine FROM scored
ORDER BY cosine DESC, vec_id LIMIT 10""",
)
def _q_lsh_multiprobe(spark, sf_dir):
    return _sim.lsh_topk_multiprobe(_t(spark, sf_dir, "embeddings"))


_DUCK_IVF_ASSIGN = f"""t AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM embeddings),
cents AS (SELECT vec_id AS centroid_id, v AS c FROM t WHERE vec_id < 16),
cscored AS (
  SELECT t.vec_id, t.label, centroid_id,
         CASE WHEN {_duck_norm('c')} > 0 AND {_duck_norm('v')} > 0
              THEN {_duck_dot('c', 'v')} / ({_duck_norm('c')} * {_duck_norm('v')})
              ELSE 0.0 END AS cosine
  FROM t, cents
),
assign AS (
  SELECT vec_id, label, centroid_id, cosine AS cos_to_centroid
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY cosine DESC, centroid_id) AS _r FROM cscored)
  WHERE _r = 1
)"""


def _duck_kmeans_sql(k: int = 8, iters: int = 2, train_bp: int | None = None) -> str:
    """Unrolled DuckDB twin of similarity.kmeans_centroids: one CTE chain
    per Lloyd's round (assign = ROW_NUMBER argmax mirroring Spark's
    max-of-struct; update = decimal(25,6)-exact per-dim mean).
    ``train_bp``: refinement reads similarity.train_sample's md5-bucket
    sample; seeds stay full-corpus — the sampled-training twin."""
    cos = (
        f"CASE WHEN {_duck_norm('c')} > 0 AND {_duck_norm('v')} > 0 "
        f"THEN {_duck_dot('c', 'v')} / ({_duck_norm('c')} * {_duck_norm('v')}) "
        "ELSE 0.0 END"
    )
    ctes = [
        f"t AS (SELECT vec_id, {_DUCK_VD} AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, v AS c, CAST(0 AS BIGINT) AS n_members "
        f"FROM t WHERE vec_id < {k})",
    ]
    tr = "t"
    if train_bp is not None:
        tr = "tt"
        bucket = _duck_hex60("vec_id || '_pqtrain' || '42'")
        ctes.append(
            f"tt AS (SELECT * FROM t WHERE {bucket} % 10000 < {int(train_bp)})"
        )
    for i in range(1, iters + 1):
        p = f"c{i - 1}"
        ctes += [
            f"""a{i} AS (
  SELECT vec_id, v, cid FROM (
    SELECT t.vec_id, t.v, {p}.cid,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
                              ORDER BY {cos} DESC, {p}.cid) AS _r
    FROM {tr} t, {p})
  WHERE _r = 1)""",
            f"""u{i} AS (
  SELECT cid, d,
         CAST(SUM(CAST(v[d] AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS val,
         COUNT(*) AS n
  FROM (SELECT cid, v, unnest(generate_series(1, 64)) AS d FROM a{i})
  GROUP BY cid, d)""",
            f"""g{i} AS (
  SELECT cid, array_agg(val ORDER BY d) AS c_new, MAX(n) AS n FROM u{i} GROUP BY cid)""",
            f"""c{i} AS (
  SELECT p.cid, COALESCE(g.c_new, p.c) AS c,
         CAST(COALESCE(g.n, 0) AS BIGINT) AS n_members
  FROM {p} p LEFT JOIN g{i} g ON p.cid = g.cid)""",
        ]
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT cid AS centroid_id, n_members, CAST(d AS INT) AS d, c[d] AS val
FROM (SELECT cid, n_members, c, unnest(generate_series(1, 64)) AS d FROM c{iters})"""
    )


@_entry(
    "kmeans_centroids",
    "Distributed Lloyd's k-means (k=8, 2 rounds) over the embedding "
    "column: broadcast-centroid cosine argmax, decimal-exact per-dim "
    "means (order-independent ⇒ bit-identical at any partitioning), "
    "empty clusters keep their previous centroid.  One lazy plan, no "
    "driver collect.  Long-form output (centroid_id, n_members, d, val).",
    _duck_kmeans_sql(k=8, iters=2),
)
def _q_kmeans(spark, sf_dir):
    return _sim.kmeans_centroids(_t(spark, sf_dir, "embeddings"), k=8, iters=2)


@_entry(
    "quantize_embeddings",
    "Symmetric per-vector int8 quantization (storage/serving prep): "
    "scale = max|x|/127, q = round(x/scale), ∞-norm reconstruction error "
    "per vector.  Row-local, no UDF; long-form (vec_id, d, qval) output.",
    f"""WITH t AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM embeddings),
s AS (
  SELECT vec_id, label, v,
         list_max(list_transform(v, x -> abs(x))) / 127 AS scale
  FROM t
),
q AS (
  SELECT vec_id, label, scale, v,
         list_transform(v, x -> CASE WHEN scale > 0
                                     THEN CAST(round(x / scale) AS INT)
                                     ELSE 0 END) AS qv
  FROM s
),
e AS (
  SELECT vec_id, label, scale, qv,
         list_max(list_transform(range(1, 65), i -> abs(v[i] - qv[i] * scale)))
           AS max_abs_err
  FROM q
)
SELECT vec_id, label, scale, max_abs_err,
       CAST(d AS INT) AS d, qv[d] AS qval
FROM (SELECT *, unnest(generate_series(1, 64)) AS d FROM e)""",
)
def _q_quantize(spark, sf_dir):
    out = _sim.quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return out.selectExpr(
        "vec_id", "label", "scale", "max_abs_err", "posexplode(q) AS (d0, qval)"
    ).selectExpr("vec_id", "label", "scale", "max_abs_err", "CAST(d0 + 1 AS INT) AS d", "qval")


@_entry(
    "ann_ivf_assignments",
    "IVF inverted-list assignment: broadcast seed centroids, per-row "
    "cosine argmax (ties → smallest centroid) — the partition-by-list "
    "write shape of IVF indexing.",
    f"WITH {_DUCK_IVF_ASSIGN} SELECT * FROM assign",
)
def _q_ivf_assign(spark, sf_dir):
    return _sim.ivf_assign(_t(spark, sf_dir, "embeddings"))


@_entry(
    "ann_ivf_occupancy",
    "Per-list occupancy/share/skew of the IVF assignment — the retrain "
    "monitor's arithmetic, hash-gated: skew is occupancy vs uniform over "
    "the FULL 16-list universe (empty lists are imbalance signal, not "
    "denominator shrinkage), centroid self-rows excluded.",
    f"""WITH {_DUCK_IVF_ASSIGN},
per AS (
  SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_vectors
  FROM assign WHERE vec_id >= 16 GROUP BY 1
), tot AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS t FROM per)
SELECT CAST(centroid_id AS INT) AS centroid_id,
       n_vectors,
       CAST(n_vectors AS DOUBLE) / t AS share,
       CAST(n_vectors AS DOUBLE) * 16 / t AS skew
FROM per, tot ORDER BY centroid_id""",
)
def _q_ivf_occupancy(spark, sf_dir):
    return _sim.ivf_occupancy_of(
        _sim.ivf_assign(_t(spark, sf_dir, "embeddings")), n_centroids=16
    )


@_entry(
    "ivf_split_occupancy",
    "Per-list occupancy AFTER an incremental list split (ivf_split_assign"
    ", round 10): lists over 30 members split cluster-locally — s-1 new "
    "centroids seeded by md5 rank of (vec_id, salt), members re-argmaxed "
    "over {parent} ∪ {its seeds} only, healthy lists byte-untouched.  "
    "The hash-gated invariant record for retrain_mode=split: k grows by "
    "exactly the deficit, membership is parent-contained, and the "
    "scored-row bill is deficit-sized, not n·k.",
    f"""WITH {_DUCK_IVF_ASSIGN},
occ AS (SELECT centroid_id, COUNT(*) AS n FROM assign GROUP BY 1),
flagged AS (
  SELECT centroid_id AS parent_id, CAST(ceil(n / 30.0) AS INT) AS s
  FROM occ WHERE n > 30
),
ranked AS (
  SELECT a.vec_id, f.parent_id, f.s,
         ROW_NUMBER() OVER (PARTITION BY f.parent_id
            ORDER BY {_duck_hex60("a.vec_id || '_split1'")}, a.vec_id) AS r
  FROM assign a JOIN flagged f ON a.centroid_id = f.parent_id
),
seeds AS (
  SELECT vec_id, parent_id,
         16 + ROW_NUMBER() OVER (ORDER BY parent_id, r) - 1 AS cand_cid
  FROM ranked WHERE r <= s - 1
),
cand AS (
  SELECT f.parent_id, f.parent_id AS cand_cid, t.v AS cv
  FROM flagged f JOIN t ON t.vec_id = f.parent_id
  UNION ALL
  SELECT sd.parent_id, sd.cand_cid, t.v AS cv
  FROM seeds sd JOIN t ON t.vec_id = sd.vec_id
),
members AS (
  SELECT a.vec_id, a.centroid_id AS parent_id, t.v AS mv
  FROM assign a JOIN flagged f ON a.centroid_id = f.parent_id
  JOIN t ON t.vec_id = a.vec_id
),
resc AS (
  SELECT m.vec_id, c.cand_cid,
         CASE WHEN {_duck_norm('c.cv')} > 0 AND {_duck_norm('m.mv')} > 0
              THEN {_duck_dot('c.cv', 'm.mv')}
                   / ({_duck_norm('c.cv')} * {_duck_norm('m.mv')})
              ELSE 0.0 END AS cosine
  FROM members m JOIN cand c ON m.parent_id = c.parent_id
),
re AS (
  SELECT vec_id, cand_cid AS centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY cosine DESC, cand_cid) AS _r FROM resc)
  WHERE _r = 1
),
final AS (
  SELECT vec_id, centroid_id FROM assign
  WHERE centroid_id NOT IN (SELECT parent_id FROM flagged)
  UNION ALL SELECT vec_id, centroid_id FROM re
)
SELECT CAST(centroid_id AS INT) AS centroid_id,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       centroid_id >= 16 AS is_new_list
FROM final GROUP BY centroid_id ORDER BY centroid_id""",
)
def _q_ivf_split_occupancy(spark, sf_dir):
    out = _sim.ivf_split_assign(
        _t(spark, sf_dir, "embeddings"), n_centroids=16, target_per_list=30
    )
    return (
        out.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .selectExpr(
            "CAST(centroid_id AS INT) AS centroid_id",
            "n_vectors",
            "centroid_id >= 16 AS is_new_list",
        )
        .orderBy("centroid_id")
    )


_IVF_TOPK_SQL = f"""WITH {_DUCK_IVF_ASSIGN},
q AS (SELECT v AS q FROM t WHERE vec_id = 0),
probe AS (
  SELECT centroid_id FROM (
    SELECT centroid_id,
           CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('c')} > 0
                THEN {_duck_dot('q', 'c')} / ({_duck_norm('q')} * {_duck_norm('c')})
                ELSE 0.0 END AS cosine
    FROM cents, q)
  ORDER BY cosine DESC, centroid_id LIMIT 4
),
cands AS (
  SELECT t.vec_id, t.label, a.centroid_id, t.v
  FROM t
  JOIN assign a ON t.vec_id = a.vec_id
  JOIN probe p ON a.centroid_id = p.centroid_id
  WHERE t.vec_id <> 0
)
SELECT vec_id, label, centroid_id,
       CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('v')} > 0
            THEN {_duck_dot('q', 'v')} / ({_duck_norm('q')} * {_duck_norm('v')})
            ELSE 0.0 END AS cosine
FROM cands, q
ORDER BY cosine DESC, vec_id LIMIT 10"""


@_entry(
    "ann_ivf_topk",
    "Approximate top-10 via IVF probe: rank centroids vs the query, scan "
    "the 4 nearest inverted lists only, exact cosine within.",
    _IVF_TOPK_SQL,
)
def _q_ivf_topk(spark, sf_dir):
    return _sim.ivf_topk(_t(spark, sf_dir, "embeddings"))


def _ivf_index_path(spark, sf_dir) -> str:
    """Build (once per input-content identity) and return the cached
    write_ivf_index path for sf_dir's embeddings table.

    The tag digests every data file's (relpath, size, mtime_ns): a
    Spark-written table is a DIRECTORY, whose own os.stat reflects the
    dirent (not the contents) with 1-second mtime granularity — an
    in-place regeneration could be served a stale index if the tag came
    from the directory stat.  The tag also carries the index FORMAT
    version (v2 = inverted lists store the vectors) so a format change
    can't probe a stale layout."""
    import hashlib
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    src = os.path.join(sf_dir, "embeddings.parquet")
    files = [src]
    if os.path.isdir(src):
        files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(src)
            for f in fs
            if not f.startswith((".", "_"))
        )
    h = hashlib.sha256(b"ivf-format-v2\n")
    for p in files:
        st = os.stat(p)
        h.update(f"{os.path.relpath(p, sf_dir)}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    path = os.path.join(tempfile.gettempdir(), f"ivf_index_{h.hexdigest()[:16]}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # build under a unique scratch dir, then atomically rename into
        # place: concurrent runs can never probe a half-written index —
        # whichever rename loses just uses the winner's identical index
        scratch = tempfile.mkdtemp(prefix="ivf_build_")
        try:
            build = os.path.join(scratch, "index")
            _sim.write_ivf_index(e, build, n_centroids=16)
            try:
                os.rename(build, path)
            except OSError:
                pass  # concurrent run won the rename
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
        # partitionOverwriteMode=dynamic suppresses Spark's _SUCCESS marker
        # on partitionBy writes, so the sentinel this cache keys on never
        # appeared and EVERY call re-built the index (measured: the rebuild
        # was ~90% of each knn-family bench rep).  Stamp it explicitly once
        # the index directory is in place; both racers build bit-identical
        # artifacts, so stamping after a lost rename is equally correct.
        if os.path.isdir(path):
            open(os.path.join(path, "_SUCCESS"), "a").close()
    return path


@_entry(
    "ann_ivf_topk_indexed",
    "The same IVF probe over a PERSISTED write_ivf_index table "
    "(partitionBy(centroid_id)): query-time work is a dynamic-partition-"
    "pruned read of the 4 probed inverted lists — the 100 TB shape, where "
    "assignment is a once-per-ingest batch job.  Results identical to the "
    "self-computing form, so it shares its oracle SQL.",
    _IVF_TOPK_SQL,
)
def _q_ivf_topk_indexed(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    path = _ivf_index_path(spark, sf_dir)
    return _sim.ivf_topk(
        e, assignments=spark.read.parquet(_sim.ivf_data_path(spark, path))
    )


@_entry(
    "ann_ivf_topk_index_only",
    "IVF probe whose CANDIDATES come exclusively from the persisted "
    "inverted lists (vectors stored in the index, partitionBy(centroid_id))"
    " — the corpus is touched only for two pushdown point-reads (query "
    "vector, seed centroids); query-time I/O is ~n_probe/n_centroids of "
    "the index bytes at any corpus size.  Same results as ann_ivf_topk, "
    "so it shares the oracle SQL.",
    _IVF_TOPK_SQL,
)
def _q_ivf_topk_index_only(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    path = _ivf_index_path(spark, sf_dir)
    return _sim.ivf_topk_from_index(spark, e, path)


# -- product quantization (IVF-PQ) -------------------------------------------

def _duck_pq_ctes(
    m: int = 4,
    ksub: int = 16,
    iters: int = 1,
    residual: bool = False,
    n_centroids: int = 16,
    train_bp: int | None = None,
    normalize: bool = False,
    src: str = "embeddings",
) -> str:
    """Shared DuckDB CTE chain for the PQ entries: subvector split, the
    unrolled Lloyd's codebook refinement (L2 argmin via ROW_NUMBER
    mirroring Spark's min-of-struct; decimal(25,6)-exact per-dim means),
    and the final per-vector encoding — the twin of
    similarity.pq_codebooks_wide / pq_codes.  ``residual=True`` inserts
    the coarse-assignment CTEs (cents/cassign) and quantizes each
    vector's residual from its centroid, with codebook seeds shifted
    past the centroid rows (similarity.ivf_residual_frame's recipe)."""
    sd = 64 // m
    off = n_centroids if residual else 0

    def d2(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {sd + 1}), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
        )

    if normalize:
        # spherical mode (similarity.normalize_embeddings): unit-norm
        # each vector before the subspace split; zero vectors unchanged
        nrm = _duck_norm("v")
        ctes = [
            f"t0 AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM {src})",
            f"t AS (SELECT vec_id, label, CASE WHEN {nrm} > 0 THEN "
            f"list_transform(v, x -> x / {nrm}) ELSE v END AS v FROM t0)",
        ]
    else:
        ctes = [
            f"t AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM {src})",
        ]
    src = "t"
    if residual:
        cos = (
            f"CASE WHEN {_duck_norm('c')} > 0 AND {_duck_norm('v')} > 0 "
            f"THEN {_duck_dot('c', 'v')} / ({_duck_norm('c')} * {_duck_norm('v')}) "
            "ELSE 0.0 END"
        )
        ctes += [
            f"cents AS (SELECT vec_id AS centroid_id, v AS c FROM t "
            f"WHERE vec_id < {n_centroids})",
            f"""cassign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT t.vec_id, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
                              ORDER BY {cos} DESC, centroid_id) AS _r
    FROM t, cents)
  WHERE _r = 1)""",
            """rt AS (
  SELECT t.vec_id, t.label, ca.centroid_id,
         list_transform(range(1, 65), i -> t.v[i] - c.c[i]) AS v
  FROM t JOIN cassign ca ON t.vec_id = ca.vec_id
  JOIN cents c ON ca.centroid_id = c.centroid_id)""",
        ]
        src = "rt"
    ctes += [
        f"""sub AS (
  SELECT vec_id, label, s - 1 AS subspace,
         v[(s - 1) * {sd} + 1 : s * {sd}] AS sv
  FROM (SELECT *, unnest(generate_series(1, {m})) AS s FROM {src}))""",
        f"b0 AS (SELECT subspace, vec_id - {off} AS code_id, sv AS c, "
        f"CAST(0 AS BIGINT) AS n_members FROM sub "
        f"WHERE vec_id >= {off} AND vec_id < {off + ksub})",
    ]
    # sampled training (similarity.train_sample's md5 bucket): the Lloyd
    # refinement reads the sample, init (b0) and the final encode (codes)
    # stay full-corpus — the FAISS train-on-sample/encode-all split
    tr = "sub"
    if train_bp is not None:
        tr = "tsub"
        bucket = _duck_hex60("vec_id || '_pqtrain' || '42'")
        ctes.append(
            f"tsub AS (SELECT * FROM sub WHERE {bucket} % 10000 < {int(train_bp)})"
        )
    for i in range(1, iters + 1):
        p = f"b{i - 1}"
        ctes += [
            f"""a{i} AS (
  SELECT subspace, vec_id, sv, code_id FROM (
    SELECT sub.subspace, sub.vec_id, sub.sv, {p}.code_id,
           ROW_NUMBER() OVER (PARTITION BY sub.subspace, sub.vec_id
                              ORDER BY {d2('sub.sv', f'{p}.c')} ASC,
                                       {p}.code_id) AS _r
    FROM {tr} sub JOIN {p} ON sub.subspace = {p}.subspace)
  WHERE _r = 1)""",
            f"""u{i} AS (
  SELECT subspace, code_id, d,
         CAST(SUM(CAST(sv[d] AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS val,
         COUNT(*) AS n
  FROM (SELECT subspace, code_id, sv,
               unnest(generate_series(1, {sd})) AS d FROM a{i})
  GROUP BY subspace, code_id, d)""",
            f"""g{i} AS (
  SELECT subspace, code_id, array_agg(val ORDER BY d) AS c_new, MAX(n) AS n
  FROM u{i} GROUP BY subspace, code_id)""",
            f"""b{i} AS (
  SELECT p.subspace, p.code_id, COALESCE(g.c_new, p.c) AS c,
         CAST(COALESCE(g.n, 0) AS BIGINT) AS n_members
  FROM {p} p LEFT JOIN g{i} g
    ON p.subspace = g.subspace AND p.code_id = g.code_id)""",
        ]
    ctes.append(
        f"""codes AS (
  SELECT vec_id, label, subspace, code FROM (
    SELECT sub.vec_id, sub.label, sub.subspace,
           CAST(b.code_id AS INT) AS code,
           ROW_NUMBER() OVER (PARTITION BY sub.subspace, sub.vec_id
                              ORDER BY {d2('sub.sv', 'b.c')} ASC,
                                       b.code_id) AS _r
    FROM sub JOIN b{iters} b ON sub.subspace = b.subspace)
  WHERE _r = 1)"""
    )
    return "WITH " + ",\n".join(ctes)


_DUCK_PQ_SD2 = (
    "list_sum(list_transform(range(1, 17), "
    "i -> (qv[i] - c[i]) * (qv[i] - c[i])))"
)

#: ADC scoring CTEs shared by the PQ top-k twins: per-query distance
#: table (exact subspace L2 vs every codeword), candidate distance = the
#: m lookups summed in SUBSPACE order (array_agg ORDER BY + list_sum ==
#: Spark's sorted-struct left fold, verified bit-exact)
_DUCK_PQ_ADC = f"""q AS (SELECT subspace, sv AS qv FROM sub WHERE vec_id = 0),
dtab AS (
  SELECT b.subspace, CAST(b.code_id AS INT) AS code, {_DUCK_PQ_SD2} AS dt
  FROM b1 b JOIN q ON b.subspace = q.subspace
),
adc AS (
  SELECT codes.vec_id, codes.label,
         list_sum(array_agg(dt ORDER BY codes.subspace)) AS adc_dist2
  FROM codes JOIN dtab
    ON codes.subspace = dtab.subspace AND codes.code = dtab.code
  WHERE codes.vec_id <> 0
  GROUP BY codes.vec_id, codes.label
)"""


@_entry(
    "pq_codebooks",
    "Product-quantization codebook training (Jégou et al. 2011): DIM=64 "
    "split into 4 16-dim subspaces, each trained k=16 by one Lloyd's round "
    "(L2 argmin, decimal-exact means) from deterministic seeds — the "
    "model side of a FAISS-style IVF-PQ index, 64× smaller vector bytes.",
    _duck_pq_ctes() + """
SELECT CAST(subspace AS INT) AS subspace, CAST(code_id AS INT) AS code_id,
       n_members, CAST(d AS INT) AS d, c[d] AS val
FROM (SELECT subspace, code_id, n_members, c,
             unnest(generate_series(1, 16)) AS d FROM b1)""",
)
def _q_pq_codebooks(spark, sf_dir):
    return _sim.pq_codebooks(_t(spark, sf_dir, "embeddings"))


@_entry(
    "pq_codes",
    "PQ encoding: each vector stored as 4 codebook ids (argmin subspace "
    "L2, ties → smallest code) — the 4-bytes-per-vector index payload "
    "that replaces 64 floats at serving time.",
    _duck_pq_ctes() + """
SELECT vec_id, label, CAST(subspace AS INT) AS subspace, code FROM codes""",
)
def _q_pq_codes(spark, sf_dir):
    return _sim.pq_codes(_t(spark, sf_dir, "embeddings"))


@_entry(
    "pq_codebooks_sampled",
    "PQ codebook training on a deterministic 50% hash-bucket sample "
    "(train_sample md5 recipe) — the FAISS 100 TB practice: training "
    "cost tracks the sample, the model stays bit-reproducible on any "
    "engine/partitioning, seeds stay full-corpus.",
    _duck_pq_ctes(train_bp=5000) + """
SELECT CAST(subspace AS INT) AS subspace, CAST(code_id AS INT) AS code_id,
       n_members, CAST(d AS INT) AS d, c[d] AS val
FROM (SELECT subspace, code_id, n_members, c,
             unnest(generate_series(1, 16)) AS d FROM b1)""",
)
def _q_pq_codebooks_sampled(spark, sf_dir):
    return _sim.pq_codebooks(
        _t(spark, sf_dir, "embeddings"), train_fraction=0.5
    )


@_entry(
    "pq_codes_sampled_train",
    "The frozen-model encode path under SAMPLED training: codebooks "
    "learned on the 50% hash sample, then EVERY corpus vector encoded "
    "against the frozen model — train-on-sample/encode-all, the split "
    "that keeps 100 TB ingest exact while training stays sample-sized.",
    _duck_pq_ctes(train_bp=5000) + """
SELECT vec_id, label, CAST(subspace AS INT) AS subspace, code FROM codes""",
)
def _q_pq_codes_sampled_train(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    cb = _sim.pq_codebooks_wide(emb, train_fraction=0.5)
    return _sim.pq_codes(emb, codebooks=cb)


@_entry(
    "kmeans_centroids_sampled",
    "Lloyd's k-means (k=8, 2 rounds) refined over the deterministic 50% "
    "hash-bucket training sample — identical contract to "
    "kmeans_centroids, training cost halved; n_members counts sample "
    "membership (the statistic the trainer actually saw).",
    _duck_kmeans_sql(k=8, iters=2, train_bp=5000),
)
def _q_kmeans_sampled(spark, sf_dir):
    return _sim.kmeans_centroids(
        _t(spark, sf_dir, "embeddings"), k=8, iters=2, train_fraction=0.5
    )


@_entry(
    "ann_pq_topk",
    "Exhaustive-ADC PQ top-10: a per-query 4×16 exact distance table, "
    "candidates ranked by summed table lookups — no candidate vector "
    "bytes are ever read (the memory-bound ANN serving baseline).",
    _duck_pq_ctes() + ",\n" + _DUCK_PQ_ADC + """
SELECT vec_id, label, adc_dist2 FROM adc
ORDER BY adc_dist2 ASC, vec_id LIMIT 10""",
)
def _q_pq_topk(spark, sf_dir):
    return _sim.pq_topk(_t(spark, sf_dir, "embeddings"))


_DUCK_IVFPQ_SQL = (
    _duck_pq_ctes()
    + """,
cents AS (SELECT vec_id AS centroid_id, v AS c FROM t WHERE vec_id < 16),
cassign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT t.vec_id, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
"""
    + f"""             CASE WHEN {_duck_norm('c')} > 0 AND {_duck_norm('v')} > 0
                  THEN {_duck_dot('c', 'v')} / ({_duck_norm('c')} * {_duck_norm('v')})
                  ELSE 0.0 END DESC, centroid_id) AS _r
    FROM t, cents)
  WHERE _r = 1),
qv0 AS (SELECT v AS q FROM t WHERE vec_id = 0),
probe AS (
  SELECT centroid_id FROM (
    SELECT centroid_id,
           CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('c')} > 0
                THEN {_duck_dot('q', 'c')} / ({_duck_norm('q')} * {_duck_norm('c')})
                ELSE 0.0 END AS cosine
    FROM cents, qv0)
  ORDER BY cosine DESC, centroid_id LIMIT 4),
"""
    + _DUCK_PQ_ADC.replace(
        "FROM codes JOIN dtab",
        """FROM (SELECT codes.* FROM codes
        JOIN cassign ON codes.vec_id = cassign.vec_id
        JOIN probe ON cassign.centroid_id = probe.centroid_id) codes
  JOIN dtab""",
    )
    + """
SELECT adc.vec_id, adc.label, cassign.centroid_id, adc.adc_dist2
FROM adc JOIN cassign ON adc.vec_id = cassign.vec_id
ORDER BY adc_dist2 ASC, adc.vec_id LIMIT 10"""
)


@_entry(
    "ann_ivfpq_topk",
    "IVF-PQ composite index (the FAISS 100 TB layout): IVF probe prunes "
    "to the 4 nearest inverted lists, ADC ranks the survivors from their "
    "4-byte PQ codes alone — query I/O is ~n_probe/n_centroids of the "
    "CODE bytes, never raw vectors.",
    _DUCK_IVFPQ_SQL,
)
def _q_ivfpq_topk(spark, sf_dir):
    return _sim.ivfpq_topk(_t(spark, sf_dir, "embeddings"))


def _ivfpq_index_path(spark, sf_dir) -> str:
    """Build (once per input-content identity) and return the cached
    write_ivfpq_index path for sf_dir's embeddings table — same
    content-hash + build-under-scratch-then-rename recipe as
    ``_ivf_index_path``."""
    import hashlib
    import os
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    src = os.path.join(sf_dir, "embeddings.parquet")
    files = [src]
    if os.path.isdir(src):
        files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(src)
            for f in fs
            if not f.startswith((".", "_"))
        )
    h = hashlib.sha256(b"ivfpq-format-v2\n")  # v2: self-contained store (+centroids table)
    for p in files:
        st = os.stat(p)
        h.update(
            f"{os.path.relpath(p, sf_dir)}|{st.st_size}|{st.st_mtime_ns}\n".encode()
        )
    path = os.path.join(
        tempfile.gettempdir(), f"ivfpq_index_{h.hexdigest()[:16]}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        scratch = tempfile.mkdtemp(prefix="ivfpq_build_")
        try:
            build = os.path.join(scratch, "index")
            _sim.write_ivfpq_index(e, build, n_centroids=16)
            # sidecars first, codes last: the codes directory's presence
            # then implies the sidecars are already in place, whatever
            # interleaving a concurrent or crashed builder left behind.
            # Each piece renames independently (skipped when the target
            # exists) so a partial state converges instead of wedging —
            # racers build bit-identical artifacts, so mixing is harmless.
            for src_p, dst_p in (
                (build + "__codebooks", path + "__codebooks"),
                (build + "__centroids", path + "__centroids"),
                (build + "__manifest", path + "__manifest"),
                (build, path),
            ):
                if not os.path.exists(dst_p):
                    try:
                        os.rename(src_p, dst_p)
                    except OSError:
                        pass  # concurrent run won the rename
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
        # partitionOverwriteMode=dynamic suppresses Spark's _SUCCESS marker
        # on partitionBy writes — the sentinel never appeared, so every
        # call re-built the whole index (measured as ~90% of each
        # knn_join_bulk/rerank bench rep).  Stamp it explicitly once codes
        # + sidecars are in place.
        if os.path.isdir(path) and os.path.isdir(path + "__manifest"):
            open(os.path.join(path, "_SUCCESS"), "a").close()
    return path


@_entry(
    "ann_ivfpq_topk_indexed",
    "The same IVF-PQ probe over a PERSISTED write_ivfpq_index store "
    "(codes partitionBy(centroid_id) + codebook/manifest tables): raw "
    "vectors are an ingest-time input only; query-time I/O is the pruned "
    "4-byte code partitions plus two corpus point-reads.  Results "
    "identical to the self-computing form, so it shares the oracle SQL.",
    _DUCK_IVFPQ_SQL,
)
def _q_ivfpq_topk_indexed(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    path = _ivfpq_index_path(spark, sf_dir)
    return _sim.ivfpq_topk_from_index(spark, e, path)


@_entry(
    "ivfpq_index_build",
    "Timed BUILD of the persisted IVF-PQ store into a FRESH scratch dir "
    "on every call (codebook train + corpus encode + list assignment + "
    "partitionBy(centroid_id) codes write + codebook/centroid/manifest "
    "sidecars): the once-per-ingest batch cost that the serving family's "
    "content-keyed cache deliberately hides from its own bench entries — "
    "this entry keeps the build path measured.  Verified through the "
    "built store itself: per-list occupancy read back from the persisted "
    "code partitions (code rows / m).",
    f"""WITH {_DUCK_IVF_ASSIGN}
SELECT CAST(centroid_id AS INT) AS centroid_id,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM assign GROUP BY centroid_id ORDER BY centroid_id""",
)
def _q_ivfpq_index_build(spark, sf_dir):
    import shutil
    import tempfile
    import time as _time

    e = _t(spark, sf_dir, "embeddings")
    # Fresh scratch per call — the POINT is to time the build, so there
    # is no content-keyed reuse here.  Stale scratches from earlier calls
    # are reclaimed once they are an hour old (never in-flight: a build
    # plus its occupancy read completes in seconds; the age guard keeps a
    # concurrent process's live build safe).
    tmp = tempfile.gettempdir()
    for d in os.listdir(tmp):
        if d.startswith("ivfpq_bench_build_"):
            p = os.path.join(tmp, d)
            try:
                if _time.time() - os.stat(p).st_mtime > 3600:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    path = os.path.join(
        tempfile.mkdtemp(prefix="ivfpq_bench_build_"), "index"
    )
    _sim.write_ivfpq_index(e, path, n_centroids=16)
    return (
        _sim.ivfpq_occupancy_report(spark, path)
        .selectExpr(
            "CAST(centroid_id AS INT) AS centroid_id",
            "CAST(n_vectors AS BIGINT) AS n_vectors",
        )
        .orderBy("centroid_id")
    )


@_entry(
    "pq_reconstruction_error",
    "Per-subspace PQ quantization-quality audit: count / decimal-exact "
    "mean / max of squared L2 between stored subvectors and their "
    "assigned codewords — the pre-rollout number for switching serving "
    "from raw vectors to 4-byte codes.",
    _duck_pq_ctes() + """,
err AS (
  SELECT sub.subspace,
         list_sum(list_transform(range(1, 17),
           i -> (sub.sv[i] - b.c[i]) * (sub.sv[i] - b.c[i]))) AS err2
  FROM sub
  JOIN codes ON sub.vec_id = codes.vec_id AND sub.subspace = codes.subspace
  JOIN b1 b ON b.subspace = codes.subspace AND b.code_id = codes.code
)
SELECT CAST(subspace AS INT) AS subspace, COUNT(*) AS n_vectors,
       CAST(SUM(CAST(err2 AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS mean_err2,
       MAX(err2) AS max_err2
FROM err GROUP BY subspace""",
)
def _q_pq_reconstruction_error(spark, sf_dir):
    return _sim.pq_reconstruction_error(_t(spark, sf_dir, "embeddings"))


def _duck_pq_recall_sql(normalize: bool = False, src: str = "embeddings") -> str:
    """Recall-report oracle: the shared exact/probe/ADC/rerank tail over
    the PQ CTE chain — ``normalize=True`` swaps in the unit-norm t CTE
    (the spherical twin; everything downstream reads t, so exact,
    probe, and ADC all live in the same geometry).  ``src`` swaps the
    corpus source (the clustered-fixture twin)."""
    return _duck_pq_ctes(normalize=normalize, src=src) + (
        """,
cents AS (SELECT vec_id AS centroid_id, v AS c FROM t WHERE vec_id < 16),
cassign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT t.vec_id, centroid_id,
"""
    + f"""           ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
             CASE WHEN {_duck_norm('c')} > 0 AND {_duck_norm('v')} > 0
                  THEN {_duck_dot('c', 'v')} / ({_duck_norm('c')} * {_duck_norm('v')})
                  ELSE 0.0 END DESC, centroid_id) AS _r
    FROM t, cents)
  WHERE _r = 1),
qv0 AS (SELECT v AS q FROM t WHERE vec_id = 0),
probe AS (
  SELECT centroid_id FROM (
    SELECT centroid_id,
           CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('c')} > 0
                THEN {_duck_dot('q', 'c')} / ({_duck_norm('q')} * {_duck_norm('c')})
                ELSE 0.0 END AS cosine
    FROM cents, qv0)
  ORDER BY cosine DESC, centroid_id LIMIT 4),
exact AS (
  SELECT vec_id FROM (
    SELECT vec_id,
           CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('v')} > 0
                THEN {_duck_dot('q', 'v')} / ({_duck_norm('q')} * {_duck_norm('v')})
                ELSE 0.0 END AS cosine
    FROM t, qv0 WHERE vec_id <> 0)
  ORDER BY cosine DESC, vec_id LIMIT 10),
"""
    + _DUCK_PQ_ADC
    + f""",
adck AS (SELECT vec_id FROM adc ORDER BY adc_dist2 ASC, vec_id LIMIT 10),
adcp AS (
  SELECT codes.vec_id,
         list_sum(array_agg(dt ORDER BY codes.subspace)) AS adc_dist2
  FROM codes
  JOIN cassign ON codes.vec_id = cassign.vec_id
  JOIN probe ON cassign.centroid_id = probe.centroid_id
  JOIN dtab ON codes.subspace = dtab.subspace AND codes.code = dtab.code
  WHERE codes.vec_id <> 0
  GROUP BY codes.vec_id
),
ivfk AS (SELECT vec_id FROM adcp ORDER BY adc_dist2 ASC, vec_id LIMIT 10),
short AS (SELECT vec_id FROM adcp ORDER BY adc_dist2 ASC, vec_id LIMIT 50),
rrk AS (
  SELECT s.vec_id FROM short s JOIN t ON s.vec_id = t.vec_id, qv0
  ORDER BY CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('v')} > 0
                THEN {_duck_dot('q', 'v')} / ({_duck_norm('q')} * {_duck_norm('v')})
                ELSE 0.0 END DESC, s.vec_id LIMIT 10)
SELECT CAST(10 AS INT) AS k,
       (SELECT COUNT(*) FROM adck WHERE vec_id IN (SELECT vec_id FROM exact))
         AS n_adc_captured,
       CAST((SELECT COUNT(*) FROM adck WHERE vec_id IN (SELECT vec_id FROM exact))
         AS DOUBLE) / 10 AS adc_recall,
       (SELECT COUNT(*) FROM ivfk WHERE vec_id IN (SELECT vec_id FROM exact))
         AS n_ivfpq_captured,
       CAST((SELECT COUNT(*) FROM ivfk WHERE vec_id IN (SELECT vec_id FROM exact))
         AS DOUBLE) / 10 AS ivfpq_recall,
       (SELECT COUNT(*) FROM rrk WHERE vec_id IN (SELECT vec_id FROM exact))
         AS n_rerank_captured,
       CAST((SELECT COUNT(*) FROM rrk WHERE vec_id IN (SELECT vec_id FROM exact))
         AS DOUBLE) / 10 AS rerank_recall"""
    )


@_entry(
    "pq_recall_report",
    "Approximation self-evaluation for the PQ serving paths: recall@10 "
    "of exhaustive-ADC and of IVF-PQ against the EXACT cosine top-10 for "
    "the same query — all three sub-pipelines are the production "
    "operators, the combine is a 1-row scalar join.",
    _duck_pq_recall_sql(),
)
def _q_pq_recall_report(spark, sf_dir):
    return _sim.pq_recall_report(_t(spark, sf_dir, "embeddings"))


@_entry(
    "pq_recall_report_normalized",
    "The recall report for SPHERICAL PQ: vectors unit-normalized before "
    "training/encode (L2² = 2−2·cos on the sphere, so the quantizer "
    "minimizes the served metric).  Exact cosine top-k is scale-"
    "invariant, so recall deltas vs pq_recall_report isolate exactly "
    "the quantizer-geometry change — the measurement that picks the "
    "serving encoding.",
    _duck_pq_recall_sql(normalize=True),
)
def _q_pq_recall_report_normalized(spark, sf_dir):
    return _sim.pq_recall_report(
        _sim.normalize_embeddings(_t(spark, sf_dir, "embeddings"))
    )


def _duck_clustered_src(n_clusters: int = 50, eps: float = 0.25) -> str:
    """DuckDB twin of ``similarity.clustered_embeddings``: the planted-
    cluster fixture derived from vec_ids via md5/hex60 mixing and a
    fixed double evaluation order, so both engines materialize the
    IDENTICAL vectors bit-for-bit (same contract as train_sample's
    buckets)."""
    key_c = f"(vec_id % {n_clusters}) || '_' || d || '_ctr'"
    key_n = "vec_id || '_' || d || '_nz'"
    center = f"CAST({_duck_hex60(key_c)} % 2001 AS DOUBLE) / 1000.5 - 1.0"
    noise = f"CAST({_duck_hex60(key_n)} % 2001 AS DOUBLE) / 1000.5 - 1.0"
    return (
        f"(SELECT vec_id, CAST(vec_id % {n_clusters} AS INT) AS label, "
        f"list_transform(range(0, 64), d -> ({center}) + {eps!r} * ({noise}))"
        " AS embedding FROM embeddings)"
    )


@_entry(
    "clustered_nn_integrity",
    "Planted-structure ground truth on the CLUSTERED embedding fixture "
    "(50 hashed centers + eps=0.25 uniform scatter, derived from vec_ids "
    "— the measurable geometry the near-uniform synthetic corpus lacks): "
    "exact top-1 neighbor per sampled query with an own-cluster hit flag.",
    f"""WITH fx AS (SELECT vec_id, label, embedding AS v FROM {_duck_clustered_src()}),
q AS (SELECT vec_id AS qid, label AS qlabel, v AS q FROM fx
      WHERE vec_id % 29 = 3 AND vec_id < 1000),
scored AS (
  SELECT qid, qlabel, vec_id, label,
         CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('v')} > 0
              THEN {_duck_dot('q', 'v')} / ({_duck_norm('q')} * {_duck_norm('v')})
              ELSE 0.0 END AS cosine
  FROM fx, q WHERE vec_id <> qid
),
top1 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
)
SELECT qid AS vec_id, qlabel AS label, vec_id AS nn_id, label AS nn_label,
       cosine, CAST(qlabel = label AS INT) AS hit
FROM top1 WHERE rn = 1 ORDER BY vec_id""",
)
def _q_clustered_nn_integrity(spark, sf_dir):
    return _sim.knn_cluster_integrity(
        _sim.clustered_embeddings(_t(spark, sf_dir, "embeddings"))
    )


@_entry(
    "clustered_pq_recall",
    "The PQ recall report measured on the CLUSTERED fixture — recall@10 "
    "of exhaustive-ADC / IVF-PQ / rerank against exact cosine top-10 on "
    "data with real structure, the number that actually predicts serving "
    "quality (the uniform corpus grades the quantizer on pure noise).",
    _duck_pq_recall_sql(src=_duck_clustered_src()),
)
def _q_clustered_pq_recall(spark, sf_dir):
    return _sim.pq_recall_report(
        _sim.clustered_embeddings(_t(spark, sf_dir, "embeddings"))
    )


@_entry(
    "ann_pq_topk_normalized",
    "Exhaustive-ADC PQ top-10 over unit-normalized vectors — spherical "
    "quantization serving cosine directly; same plan shape as "
    "ann_pq_topk, only the geometry changes.",
    _duck_pq_ctes(normalize=True) + ",\n" + _DUCK_PQ_ADC + """
SELECT vec_id, label, adc_dist2 FROM adc
ORDER BY adc_dist2 ASC, vec_id LIMIT 10""",
)
def _q_pq_topk_normalized(spark, sf_dir):
    return _sim.pq_topk(
        _sim.normalize_embeddings(_t(spark, sf_dir, "embeddings"))
    )


_DUCK_IVFPQ_RERANK_SQL = (
    _duck_pq_ctes()
    + """,
cents AS (SELECT vec_id AS centroid_id, v AS c FROM t WHERE vec_id < 16),
cassign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT t.vec_id, centroid_id,
"""
    + f"""           ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
             CASE WHEN {_duck_norm('c')} > 0 AND {_duck_norm('v')} > 0
                  THEN {_duck_dot('c', 'v')} / ({_duck_norm('c')} * {_duck_norm('v')})
                  ELSE 0.0 END DESC, centroid_id) AS _r
    FROM t, cents)
  WHERE _r = 1),
qv0 AS (SELECT v AS q FROM t WHERE vec_id = 0),
probe AS (
  SELECT centroid_id FROM (
    SELECT centroid_id,
           CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('c')} > 0
                THEN {_duck_dot('q', 'c')} / ({_duck_norm('q')} * {_duck_norm('c')})
                ELSE 0.0 END AS cosine
    FROM cents, qv0)
  ORDER BY cosine DESC, centroid_id LIMIT 4),
"""
    + _DUCK_PQ_ADC.replace(
        "FROM codes JOIN dtab",
        """FROM (SELECT codes.* FROM codes
        JOIN cassign ON codes.vec_id = cassign.vec_id
        JOIN probe ON cassign.centroid_id = probe.centroid_id) codes
  JOIN dtab""",
    )
    + f""",
short AS (
  SELECT adc.vec_id, adc.label, cassign.centroid_id, adc.adc_dist2
  FROM adc JOIN cassign ON adc.vec_id = cassign.vec_id
  ORDER BY adc_dist2 ASC, adc.vec_id LIMIT 50)
SELECT s.vec_id, s.label, s.centroid_id, s.adc_dist2,
       CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('v')} > 0
            THEN {_duck_dot('q', 'v')} / ({_duck_norm('q')} * {_duck_norm('v')})
            ELSE 0.0 END AS cosine
FROM short s JOIN t ON s.vec_id = t.vec_id, qv0
ORDER BY cosine DESC, s.vec_id LIMIT 10"""
)


@_entry(
    "ann_ivfpq_rerank_topk",
    "Two-stage serving (FAISS IVFPQR shape): IVF-PQ builds a 50-deep "
    "shortlist from 4-byte codes alone, then ONLY those 50 raw vectors "
    "are read back and re-ranked by exact cosine — quantization error "
    "repaired where it matters, for shortlist-many point-reads.",
    _DUCK_IVFPQ_RERANK_SQL,
)
def _q_ivfpq_rerank_topk(spark, sf_dir):
    return _sim.ivfpq_rerank_topk(_t(spark, sf_dir, "embeddings"))


@_entry(
    "ann_ivfpq_rerank_indexed",
    "The two-stage rerank with stage one served from the PERSISTED "
    "IVF-PQ store: pruned code partitions build the 50-deep shortlist, "
    "the corpus is point-read for just those vectors plus the query.  "
    "Results identical to the self-computing form (same oracle).",
    _DUCK_IVFPQ_RERANK_SQL,
)
def _q_ivfpq_rerank_indexed(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    path = _ivfpq_index_path(spark, sf_dir)
    return _sim.ivfpq_rerank_from_index(spark, e, path)


#: the external query embedding for the literal-query entries — exact
#: sixteenths, so the Spark literal and the DuckDB literal parse to
#: bit-identical doubles on both engines
_QUERY_VEC = [((i * 5) % 16 - 8) / 16.0 for i in range(64)]
_DUCK_QV = "[" + ", ".join(repr(x) for x in _QUERY_VEC) + "]::DOUBLE[]"


def _duck_literal_query(sql: str) -> str:
    """Rewrite a vec_id=0-keyed PQ oracle into its EXTERNAL-QUERY twin:
    qv0 becomes the inlined literal vector, the ADC distance table
    derives its query subvectors from the literal instead of the stored
    subvector rows, and the self-match exclusion keys on the -1 sentinel
    (excluding nothing) — mirroring similarity.literal_query_frame."""
    old_qv0 = "qv0 AS (SELECT v AS q FROM t WHERE vec_id = 0)"
    old_q = "q AS (SELECT subspace, sv AS qv FROM sub WHERE vec_id = 0)"
    old_ex = "WHERE codes.vec_id <> 0"
    for needle in (old_qv0, old_q, old_ex):
        assert needle in sql, f"literal-query rewrite: missing {needle!r}"
    new_q = (
        "q AS (SELECT s - 1 AS subspace, q0.q[(s - 1) * 16 + 1 : s * 16] AS qv "
        "FROM (SELECT q, unnest(generate_series(1, 4)) AS s FROM qv0) q0)"
    )
    return (
        sql.replace(old_qv0, f"qv0 AS (SELECT {_DUCK_QV} AS q)")
        .replace(old_q, new_q)
        .replace(old_ex, "WHERE codes.vec_id <> -1")
    )


@_entry(
    "ann_cosine_topk_queryvec",
    "Exact brute-force cosine top-10 for an EXTERNAL query embedding "
    "(the retrieval-service arrival shape): the vector folds into the "
    "plan as a double-literal array — same broadcast/fold/TakeOrdered "
    "plan as ann_cosine_topk, no corpus point-read for the query.",
    f"""WITH t AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM embeddings),
q AS (SELECT {_DUCK_QV} AS q),
scored AS (
  SELECT vec_id, label,
         CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('v')} > 0
              THEN {_duck_dot('q', 'v')} / ({_duck_norm('q')} * {_duck_norm('v')})
              ELSE 0.0 END AS cosine
  FROM t, q WHERE vec_id <> -1
)
SELECT * FROM scored ORDER BY cosine DESC, vec_id LIMIT 10""",
)
def _q_ann_topk_queryvec(spark, sf_dir):
    return _sim.cosine_topk(
        _t(spark, sf_dir, "embeddings"), query_vec=_QUERY_VEC
    )


@_entry(
    "ann_ivfpq_topk_queryvec",
    "IVF-PQ top-10 for an EXTERNAL query embedding: probe, distance "
    "table, and ADC all read the inlined literal — with a persisted "
    "store this serves entirely from code bytes, zero corpus reads "
    "(ann_ivfpq_queryvec_indexed pins that form to the same oracle).",
    _duck_literal_query(_DUCK_IVFPQ_SQL),
)
def _q_ivfpq_topk_queryvec(spark, sf_dir):
    return _sim.ivfpq_topk(
        _t(spark, sf_dir, "embeddings"), query_vec=_QUERY_VEC
    )


@_entry(
    "ann_ivfpq_queryvec_indexed",
    "The external-query IVF-PQ top-10 served from the PERSISTED store: "
    "the literal query probes the store's centroid table and scores "
    "pruned code partitions — the ONLY parquet read in the whole plan "
    "is the store; the corpus is never touched.",
    _duck_literal_query(_DUCK_IVFPQ_SQL),
)
def _q_ivfpq_queryvec_indexed(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    path = _ivfpq_index_path(spark, sf_dir)
    return _sim.ivfpq_topk_from_index(spark, e, path, query_vec=_QUERY_VEC)


@_entry(
    "ann_ivfpq_rerank_queryvec",
    "Two-stage rerank for an EXTERNAL query embedding: code-only "
    "shortlist from the literal's distance table, then exact cosine "
    "against the literal over the 50 shortlisted vectors — the full "
    "production serving path for a query that arrives as an embedding.",
    _duck_literal_query(_DUCK_IVFPQ_RERANK_SQL),
)
def _q_ivfpq_rerank_queryvec(spark, sf_dir):
    return _sim.ivfpq_rerank_topk(
        _t(spark, sf_dir, "embeddings"), query_vec=_QUERY_VEC
    )


@_entry(
    "ann_lsh_topk_queryvec",
    "LSH bucket probe for an EXTERNAL query embedding: the literal is "
    "bucketed by the same deterministic plane expressions as the corpus "
    "(it lands exactly where a stored copy would), then exact cosine "
    "within its bucket — completes query_vec across every ANN path.",
    f"""WITH t AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM embeddings),
tb AS (SELECT vec_id, label, v, {_duck_bucket('v')} AS bucket FROM t),
q AS (SELECT q, {_duck_bucket('q')} AS qbucket FROM (SELECT {_DUCK_QV} AS q)),
scored AS (
  SELECT vec_id, label, bucket,
         CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('v')} > 0
              THEN {_duck_dot('q', 'v')} / ({_duck_norm('q')} * {_duck_norm('v')})
              ELSE 0.0 END AS cosine
  FROM tb, q WHERE bucket = qbucket AND vec_id <> -1
)
SELECT * FROM scored ORDER BY cosine DESC, vec_id LIMIT 10""",
)
def _q_lsh_topk_queryvec(spark, sf_dir):
    return _sim.lsh_topk(
        _t(spark, sf_dir, "embeddings"), query_vec=_QUERY_VEC
    )


@_entry(
    "ann_ivf_topk_queryvec",
    "IVF probe for an EXTERNAL query embedding: centroid ranking and "
    "within-list exact cosine both read the inlined literal — the "
    "raw-vector sibling of ann_ivfpq_topk_queryvec.",
    _IVF_TOPK_SQL.replace(
        "q AS (SELECT v AS q FROM t WHERE vec_id = 0)",
        f"q AS (SELECT {_DUCK_QV} AS q)",
    ).replace("WHERE t.vec_id <> 0", "WHERE t.vec_id <> -1"),
)
def _q_ivf_topk_queryvec(spark, sf_dir):
    return _sim.ivf_topk(
        _t(spark, sf_dir, "embeddings"), query_vec=_QUERY_VEC
    )


def _duck_ivfpq_batch_sql(qpred: str = "vec_id < 8", k: int = 5) -> str:
    """Batched-IVF-PQ oracle over an arbitrary query predicate: the
    shared per-query probe/distance-table/ADC chain, with the query set
    q0 = corpus rows matching ``qpred`` — the twin of both the literal
    batch (first-8) and the bulk knn_join (sampled query frame)."""
    return (
        _duck_pq_ctes()
        + f""",
q0 AS (SELECT vec_id AS query_id, v FROM t WHERE {qpred}),
qsub AS (
  SELECT query_id, s - 1 AS subspace, v[(s - 1) * 16 + 1 : s * 16] AS qv
  FROM (SELECT query_id, v, unnest(generate_series(1, 4)) AS s FROM q0)),
cents AS (SELECT vec_id AS centroid_id, v AS c FROM t WHERE vec_id < 16),
cassign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT t.vec_id, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
             CASE WHEN {_duck_norm('c')} > 0 AND {_duck_norm('v')} > 0
                  THEN {_duck_dot('c', 'v')} / ({_duck_norm('c')} * {_duck_norm('v')})
                  ELSE 0.0 END DESC, centroid_id) AS _r
    FROM t, cents)
  WHERE _r = 1),
probe AS (
  SELECT query_id, centroid_id FROM (
    SELECT q0.query_id, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q0.query_id ORDER BY
             CASE WHEN {_duck_norm('v')} > 0 AND {_duck_norm('c')} > 0
                  THEN {_duck_dot('v', 'c')} / ({_duck_norm('v')} * {_duck_norm('c')})
                  ELSE 0.0 END DESC, centroid_id) AS _r
    FROM q0, cents)
  WHERE _r <= 4),
dtab AS (
  SELECT query_id, b.subspace, CAST(b.code_id AS INT) AS code,
         {_DUCK_PQ_SD2} AS dt
  FROM b1 b JOIN qsub ON b.subspace = qsub.subspace),
adc AS (
  SELECT d.query_id, codes.vec_id, codes.label, ca.centroid_id,
         list_sum(array_agg(dt ORDER BY codes.subspace)) AS adc_dist2
  FROM codes
  JOIN cassign ca ON codes.vec_id = ca.vec_id
  JOIN probe p ON p.centroid_id = ca.centroid_id
  JOIN dtab d ON d.query_id = p.query_id
             AND d.subspace = codes.subspace AND d.code = codes.code
  WHERE codes.vec_id <> p.query_id
  GROUP BY d.query_id, codes.vec_id, codes.label, ca.centroid_id)
SELECT query_id, vec_id, label, centroid_id, adc_dist2,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc_dist2 ASC, vec_id) AS INT) AS rnk
FROM adc
QUALIFY rnk <= {k}"""
    )


def _duck_knn_join_rerank_sql(qpred: str, k: int, depth: int) -> str:
    """knn_join's RERANK-tier oracle: the shared batch ADC chain ranks a
    per-query shortlist of ``depth``, which joins back to the RAW
    vectors (corpus on vec_id, query on query_id) and re-ranks by exact
    cosine — the same raw-vs-raw fold the Spark rerank computes, so the
    doubles hash-match bit-for-bit."""
    base = _duck_ivfpq_batch_sql(qpred=qpred, k=depth)
    head, _, _ = base.rpartition("\nSELECT query_id,")
    return (
        head
        + f""",
short AS (
  SELECT query_id, vec_id, label, centroid_id, adc_dist2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist2 ASC, vec_id) AS _rd
  FROM adc),
rer AS (
  SELECT s.query_id, s.vec_id, s.label, s.centroid_id, s.adc_dist2,
         CASE WHEN {_duck_norm('qq')} > 0 AND {_duck_norm('cv')} > 0
              THEN {_duck_dot('qq', 'cv')} / ({_duck_norm('qq')} * {_duck_norm('cv')})
              ELSE 0.0 END AS cosine
  FROM short s
  JOIN (SELECT vec_id, v AS cv FROM t) c ON c.vec_id = s.vec_id
  JOIN (SELECT query_id, v AS qq FROM q0) q ON q.query_id = s.query_id
  WHERE s._rd <= {depth})
SELECT query_id, vec_id, label, centroid_id, adc_dist2, cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS INT) AS rnk
FROM rer
QUALIFY rnk <= {k}"""
    )


_DUCK_IVFPQ_BATCH_SQL = _duck_ivfpq_batch_sql()


@_entry(
    "ann_ivfpq_topk_batch",
    "BATCHED IVF-PQ serving: top-5 for each of the first 8 vectors "
    "through ONE pass of the code store — per-query distance tables and "
    "probe lists are model-sized broadcasts, each code row is read once "
    "and replicated only to the queries probing its list; per-query "
    "results identical to the single-query operator (pytest-pinned).",
    _DUCK_IVFPQ_BATCH_SQL,
)
def _q_ivfpq_topk_batch(spark, sf_dir):
    return _sim.ivfpq_topk_batch(_t(spark, sf_dir, "embeddings"))


@_entry(
    "ann_ivfpq_batch_indexed",
    "The batched IVF-PQ server over the PERSISTED store: N queries "
    "amortize one scan of the union of their pruned code partitions — "
    "identical per-query results to the self-computing batch (same "
    "frozen models), so it shares that oracle.",
    # same oracle as ann_ivfpq_topk_batch: the persisted store's frozen
    # models equal the inline training over the same corpus
    _DUCK_IVFPQ_BATCH_SQL,
)
def _q_ivfpq_batch_indexed(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    path = _ivfpq_index_path(spark, sf_dir)
    return _sim.ivfpq_topk_batch_from_index(spark, e, path)


@_entry(
    "knn_join_bulk",
    "Bulk k-NN JOIN: top-5 ADC neighbors for EVERY row of a query "
    "DataFrame against the persisted IVF-PQ store — the curation-job "
    "shape (dedup-against-reference, retrieval labeling).  Nothing "
    "query-sized broadcasts: probes assign via broadcast centroids, "
    "distance tables stay distributed, codes join probe pairs on "
    "centroid_id in ONE corpus shuffle.",
    _duck_ivfpq_batch_sql(qpred="vec_id % 37 = 1"),
)
def _q_knn_join_bulk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    path = _ivfpq_index_path(spark, sf_dir)
    qdf = e.filter("vec_id % 37 = 1")
    return _sim.knn_join(spark, qdf, path, k=5, n_probe=4)


@_entry(
    "knn_join_rerank",
    "Bulk k-NN JOIN, RERANK tier: each query's depth-20 ADC shortlist "
    "joins back to the raw corpus vectors ON vec_id (a key join — the "
    "corpus prunes to shortlisted ids, read once, never broadcast) and "
    "re-ranks by EXACT cosine — the high-recall curation path (round-12 "
    "grid: ADC ~0.21 recall@10 at serving config, rerank 0.94); same "
    "distributed-query discipline as the ADC tier.",
    _duck_knn_join_rerank_sql(qpred="vec_id % 37 = 1", k=5, depth=20),
)
def _q_knn_join_rerank(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    path = _ivfpq_index_path(spark, sf_dir)
    qdf = e.filter("vec_id % 37 = 1")
    return _sim.knn_join(
        spark, qdf, path, k=5, n_probe=4, rerank_depth=20, corpus=e
    )


_DUCK_IVFPQ_RES_SQL = (
    _duck_pq_ctes(residual=True)
    + f""",
qv0 AS (SELECT v AS q FROM t WHERE vec_id = 0),
probe AS (
  SELECT centroid_id, c FROM (
    SELECT centroid_id, c,
           CASE WHEN {_duck_norm('q')} > 0 AND {_duck_norm('c')} > 0
                THEN {_duck_dot('q', 'c')} / ({_duck_norm('q')} * {_duck_norm('c')})
                ELSE 0.0 END AS cosine
    FROM cents, qv0)
  ORDER BY cosine DESC, centroid_id LIMIT 4),
qres AS (
  SELECT centroid_id, s - 1 AS subspace,
         rq[(s - 1) * 16 + 1 : s * 16] AS qv
  FROM (SELECT centroid_id,
               list_transform(range(1, 65), i -> q[i] - c[i]) AS rq,
               unnest(generate_series(1, 4)) AS s
        FROM probe, qv0)),
dtab AS (
  SELECT qres.centroid_id, b.subspace, CAST(b.code_id AS INT) AS code,
         list_sum(list_transform(range(1, 17),
           i -> (qres.qv[i] - b.c[i]) * (qres.qv[i] - b.c[i]))) AS dt
  FROM b1 b JOIN qres ON b.subspace = qres.subspace),
adc AS (
  SELECT codes.vec_id, codes.label, ca.centroid_id,
         list_sum(array_agg(dt ORDER BY codes.subspace)) AS adc_dist2
  FROM codes
  JOIN cassign ca ON codes.vec_id = ca.vec_id
  JOIN dtab ON ca.centroid_id = dtab.centroid_id
           AND codes.subspace = dtab.subspace AND codes.code = dtab.code
  WHERE codes.vec_id <> 0
  GROUP BY codes.vec_id, codes.label, ca.centroid_id)
SELECT vec_id, label, centroid_id, adc_dist2 FROM adc
ORDER BY adc_dist2 ASC, vec_id LIMIT 10"""
)


@_entry(
    "ann_ivfpq_residual_topk",
    "Residual-encoded IVF-PQ (the faithful FAISS IVFPQ dataflow): codes "
    "quantize each vector's residual from its coarse centroid; the query "
    "builds one ADC table per probed list from its residual against that "
    "list's centroid.  Whether residuals beat raw encoding is measured "
    "(pq_reconstruction_error residual=True/False), not assumed.",
    _DUCK_IVFPQ_RES_SQL,
)
def _q_ivfpq_residual_topk(spark, sf_dir):
    return _sim.ivfpq_residual_topk(_t(spark, sf_dir, "embeddings"))


@_entry(
    "pq_residual_reconstruction_error",
    "The residual-encoding twin of pq_reconstruction_error: per-subspace "
    "count / decimal-exact mean / max squared L2 between residual "
    "subvectors and their codewords — compare against the raw report to "
    "PICK the serving encoding (on this corpus raw wins: cosine coarse "
    "assignment over unnormalized vectors leaves residuals wider than "
    "the vectors themselves).",
    _duck_pq_ctes(residual=True) + """,
err AS (
  SELECT sub.subspace,
         list_sum(list_transform(range(1, 17),
           i -> (sub.sv[i] - b.c[i]) * (sub.sv[i] - b.c[i]))) AS err2
  FROM sub
  JOIN codes ON sub.vec_id = codes.vec_id AND sub.subspace = codes.subspace
  JOIN b1 b ON b.subspace = codes.subspace AND b.code_id = codes.code
)
SELECT CAST(subspace AS INT) AS subspace, COUNT(*) AS n_vectors,
       CAST(SUM(CAST(err2 AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS mean_err2,
       MAX(err2) AS max_err2
FROM err GROUP BY subspace""",
)
def _q_pq_residual_reconstruction_error(spark, sf_dir):
    return _sim.pq_reconstruction_error(
        _t(spark, sf_dir, "embeddings"), residual=True
    )


_DUCK_SEMDEDUP_PAIRS = f"""tv AS (
  SELECT t.vec_id, v, centroid_id FROM t JOIN assign USING (vec_id)
),
sempairs AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.centroid_id,
         CASE WHEN {_duck_norm('a.v')} > 0 AND {_duck_norm('b.v')} > 0
              THEN {_duck_dot('a.v', 'b.v')} / ({_duck_norm('a.v')} * {_duck_norm('b.v')})
              ELSE 0.0 END AS cosine
  FROM tv a JOIN tv b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
)"""


@_entry(
    "semantic_dedup_pairs",
    "SemDeDup-style semantic near-dup pairs: IVF-cluster the corpus, "
    "exact cosine only within a cluster — O(Σ|cluster|²) not O(n²). "
    "Threshold 0.35 fits the synthetic near-orthogonal fixture (realistic "
    "corpora use ~0.9+); the dataflow is threshold-independent.",
    f"""WITH {_DUCK_IVF_ASSIGN}, {_DUCK_SEMDEDUP_PAIRS}
SELECT vec_id_a, vec_id_b, centroid_id, cosine
FROM sempairs WHERE cosine >= 0.35""",
)
def _q_semdedup_pairs(spark, sf_dir):
    return _sim.semantic_dedup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.35
    )


@_entry(
    "semantic_dedup_survivors",
    "Greedy min-id semantic dedup: drop every vector similar to a "
    "smaller-id cluster-mate; the distinct dropped set anti-joins the "
    "corpus (duplicate-sized, never corpus-sized state).",
    f"""WITH {_DUCK_IVF_ASSIGN}, {_DUCK_SEMDEDUP_PAIRS},
dropped AS (SELECT DISTINCT vec_id_b AS vec_id FROM sempairs WHERE cosine >= 0.35)
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""",
)
def _q_semdedup_survivors(spark, sf_dir):
    return _sim.semantic_dedup_survivors(
        _t(spark, sf_dir, "embeddings"), threshold=0.35
    )


@_entry(
    "embedding_norms",
    "Vector-column sanity profile: dimensionality + L2 norm per vector.",
    f"""WITH t AS (SELECT vec_id, label, {_DUCK_VD} AS v FROM embeddings)
SELECT vec_id, label, len(v) AS dim, {_duck_norm('v')} AS l2_norm FROM t""",
)
def _q_emb_norms(spark, sf_dir):
    return _sim.embedding_norms(_t(spark, sf_dir, "embeddings"))


@_entry(
    "label_centroids",
    "Per-label mean embedding (class prototypes), long form — decimal-"
    "quantized sums make the cross-row float mean associative, exact and "
    "cluster-size-independent; one hash aggregate on (label, dim).",
    """WITH e AS (
  SELECT label,
         CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
         unnest(embedding) AS val
  FROM embeddings
)
SELECT label, dim,
       CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE)
       / CAST(COUNT(*) AS DOUBLE) AS centroid,
       COUNT(*) AS n_vectors
FROM e GROUP BY label, dim""",
)
def _q_label_centroids(spark, sf_dir):
    return _sim.label_centroids(_t(spark, sf_dir, "embeddings"))


# -- multimodal plumbing -----------------------------------------------------

@_entry(
    "multimodal_metadata",
    "Binary-column plumbing: documents as opaque payloads with typed "
    "metadata (byte length + sha256) — the binaryFile-source contract.",
    """SELECT doc_id, 'image' AS media_type,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256
FROM documents""",
)
def _q_mm_meta(spark, sf_dir):
    m = _mm.documents_as_media(_t(spark, sf_dir, "documents"))
    return m.select(
        "doc_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
    )


@_entry(
    "multimodal_features",
    "Arrow-batched mapInPandas decode+featurize plumbing (decoder is a "
    "deterministic stub; schema/batching/partitioning are real).  The "
    "opaque feature vector is excluded from the gate projection, so the "
    "remaining metadata columns ARE SQL-expressible: the stub's "
    "byte-length arithmetic is the oracle.",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'image' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(64 + octet_length(encode(text)) % 64 AS INT) AS width,
       CAST(64 + octet_length(encode(text)) % 48 AS INT) AS height,
       CAST(1 AS INT) AS n_frames
FROM documents""",
)
def _q_mm_features(spark, sf_dir):
    m = _mm.documents_as_media(_t(spark, sf_dir, "documents"))
    return _mm.extract_features(m).select(
        "doc_id", "media_type", "n_bytes", "width", "height", "n_frames"
    )


@_entry(
    "media_decode_features",
    "REAL stdlib media decode: synthesized WAV (square-wave 16-bit "
    "PCM), PNG (grayscale-8), and baseline JPEG (round-13: from-scratch "
    "Huffman + dequant + IDCT) payloads are genuinely decoded.  The "
    "JPEG fixture is a constant even-gray image, whose lone DC "
    "coefficient quantizes and reconstructs EXACTLY — so the oracle "
    "states all three modalities' decoded features closed-form from "
    "doc_id while the Spark side sees only bytes; a decode bug cannot "
    "hash-match.",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'wav' WHEN 1 THEN 'png'
            ELSE 'jpeg' END AS container,
       CASE WHEN doc_id % 3 = 0 THEN 8000 END AS sample_rate,
       CASE WHEN doc_id % 3 = 0 THEN 1 END AS n_channels,
       CASE WHEN doc_id % 3 = 0
            THEN CAST((800 + (doc_id % 7) * 160) // 8 AS BIGINT)
       END AS duration_ms,
       CASE WHEN doc_id % 3 = 0
            THEN CAST(1000 + (doc_id % 13) * 500 AS DOUBLE)
       END AS rms,
       CASE WHEN doc_id % 3 = 0
            THEN CAST(1000 + (doc_id % 13) * 500 AS DOUBLE)
       END AS peak,
       CASE WHEN doc_id % 3 = 1 THEN CAST(8 + doc_id % 9 AS INT)
            WHEN doc_id % 3 = 2 THEN CAST(8 * (1 + doc_id % 4) AS INT)
       END AS width,
       CASE WHEN doc_id % 3 = 1 THEN CAST(5 + doc_id % 7 AS INT)
            WHEN doc_id % 3 = 2 THEN CAST(8 * (1 + doc_id % 5) AS INT)
       END AS height,
       CASE WHEN doc_id % 3 IN (1, 2) THEN 8 END AS bit_depth,
       CASE WHEN doc_id % 3 = 1
            THEN CAST(list_sum(list_transform(
                   range(0, (8 + doc_id % 9) * (5 + doc_id % 7)),
                   i -> (i + doc_id) % 256)) AS DOUBLE)
                 / ((8 + doc_id % 9) * (5 + doc_id % 7))
            WHEN doc_id % 3 = 2
            THEN CAST(2 * ((doc_id * 37) % 128) AS DOUBLE)
       END AS px_mean
FROM documents WHERE doc_id % 11 = 0""",
)
def _q_media_decode(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter("doc_id % 11 = 0")
    return _mm.media_decode_features(_mm.synthesize_media_fixture(docs))


@_entry(
    "video_container_features",
    "REAL MP4/ISO-BMFF container decode (round-13, zero codecs): a "
    "validated box walk over genuine MP4 bytes — brand, mvhd/mdhd "
    "clocks, hdlr track type, stsd codec fourcc + coded dimensions, "
    "and the frame count cross-checked stts-vs-stsz.  The metadata a "
    "video-curation pipeline reads BEFORE committing codec compute; "
    "the oracle states it closed-form from the fixture's parameters "
    "while Spark sees only bytes.",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'mp4' AS container,
       'isom' AS major_brand,
       'avc1' AS codec,
       CAST(1000 AS INT) AS timescale,
       CAST(40 * (10 + doc_id % 50) AS BIGINT) AS duration_ms,
       CAST(10 + doc_id % 50 AS INT) AS n_frames,
       CAST(16 * (1 + doc_id % 20) AS INT) AS width,
       CAST(16 * (1 + doc_id % 11) AS INT) AS height
FROM documents WHERE doc_id % 13 = 0""",
)
def _q_video_container(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter("doc_id % 13 = 0")
    return _mm.video_container_features(_mm.synthesize_video_fixture(docs))


@_entry(
    "video_frame_sample",
    "Frame-sampling plan over REAL MP4 metadata: every-10th frame index "
    "per asset, n_frames from the genuine stts/stsz decode — the "
    "declarative 1→N expansion (sequence + explode, row-local) a video "
    "pipeline hands to its codec stage; the oracle derives the same "
    "grid closed-form from the fixture parameters.",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(10 + doc_id % 50 AS INT) AS n_frames,
       CAST(unnest(range(0, 10 + doc_id % 50, 10)) AS INT) AS frame_index
FROM documents WHERE doc_id % 13 = 0""",
)
def _q_video_frame_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter("doc_id % 13 = 0")
    return _mm.video_frame_sample_plan(
        _mm.synthesize_video_fixture(docs), every_n=10
    )


@_entry(
    "multimodal_frame_sample",
    "1→N frame-sampling expansion over decoded n_frames (video plumbing). "
    "The stub decoder's frame count is byte-length arithmetic, so the "
    "expansion is oracle-able: unnest(range(0, n_frames, 10)) mirrors "
    "Spark's explode(sequence(0, n_frames-1, 10)).",
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'video' AS media_type,
       CAST(1 + octet_length(encode(text)) % 250 AS INT) AS n_frames,
       CAST(unnest(range(0, 1 + octet_length(encode(text)) % 250, 10)) AS INT)
         AS frame_index
FROM documents""",
)
def _q_mm_frames(spark, sf_dir):
    m = _mm.documents_as_media(_t(spark, sf_dir, "documents"), media_type="video")
    return _mm.frame_sample_plan(m)


# ===========================================================================
# Breadth extensions: rollup aggregates, promo-share join, embedding
# near-dup, regex tokenization
# ===========================================================================

@_entry(
    "events_rollup",
    "ROLLUP(day, event_type): grand/sub-total lattice in one pass "
    "(Catalyst Expand + single shuffle).",
    f"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n_events,
       {_DSUM.format(x='value')} AS total_value
FROM events
GROUP BY ROLLUP(strftime(ts, '%Y-%m-%d'), event_type)""",
)
def _q_rollup(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    return (
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type", "value")
        .rollup("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
        )
    )


@_entry(
    "q14_promo_revenue",
    "TPC-H Q14 (adapted): promo revenue share — broadcast part⋈lineitem, "
    "conditional aggregation over exact decimal sums.",
    f"""SELECT
  100.0 * CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                   THEN l_extendedprice * (1.0 - l_discount) ELSE 0 END AS DECIMAL(25,6)))
             AS DOUBLE)
        / {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS promo_revenue_pct,
  {_DSUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'""",
)
def _q14(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    f = F.lit("1996-01-01").cast("timestamp_ntz")
    t = F.lit("1996-07-01").cast("timestamp_ntz")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    j = li.filter((F.col("l_shipdate") >= f) & (F.col("l_shipdate") < t)).join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    agg = j.agg(
        F.sum(promo.cast("decimal(25,6)")).cast("double").alias("promo_rev"),
        F.sum(rev.cast("decimal(25,6)")).cast("double").alias("total_revenue"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_revenue")).alias(
            "promo_revenue_pct"
        ),
        "total_revenue",
    )


@_entry(
    "ann_near_dup_pairs",
    "Embedding-cosine near-duplicate pairs among the first 200 vectors "
    "(cosine > 0.35, a < b) — the semantic-dedup primitive.",
    f"""WITH t AS (SELECT vec_id, {_DUCK_VD} AS v FROM embeddings WHERE vec_id < 200),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         {_duck_dot('a.v', 'b.v')} /
         ({_duck_norm('a.v')} * {_duck_norm('b.v')}) AS cosine
  FROM t a JOIN t b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine > 0.35""",
)
def _q_ann_neardup(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    t = e.selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    a = t.selectExpr("vec_id AS vec_a", "v AS va")
    b = t.selectExpr("vec_id AS vec_b", "v AS vb")
    dot = "aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    na = "sqrt(aggregate(va, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))"
    nb = "sqrt(aggregate(vb, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))"
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .selectExpr("vec_a", "vec_b", f"{dot} / ({na} * {nb}) AS cosine")
        .filter(F.col("cosine") > 0.35)
    )


@_entry(
    "text_token_count_regex",
    "BPE-ish regex tokenization: word pieces + standalone punctuation "
    "(the pre-tokenizer shape real BPE vocabularies apply).",
    """SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS n_pieces,
       len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))) AS n_unique_pieces
FROM documents""",
)
def _q_bpe_tokens(spark, sf_dir):
    pat = "'[a-z0-9]+|[^a-z0-9\\\\s]'"
    return _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"size(regexp_extract_all(lower(text), {pat}, 0)) AS n_pieces",
        f"size(array_distinct(regexp_extract_all(lower(text), {pat}, 0))) AS n_unique_pieces",
    )


# -- temporal joins (as-of, interval containment) ----------------------------

from admira_etl_project_prueba_spark.operators.asof import asof_join as _asof_join
from admira_etl_project_prueba_spark.operators.asof import (
    interval_bin_join as _interval_bin_join,
)


@_entry(
    "events_in_spike_windows",
    "Interval-containment join via time-bin expansion (equi-join on bin + "
    "exact containment filter — no nested loop): events falling inside "
    "24h windows [12:00→12:00) around the top-3 value days.",
    """WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         SUM(CAST(value AS DECIMAL(25,6))) AS v
  FROM events GROUP BY 1
),
top3 AS (SELECT day FROM daily ORDER BY CAST(v AS DOUBLE) DESC, day LIMIT 3),
win AS (
  SELECT CAST(day || ' 12:00:00' AS TIMESTAMP) AS wstart,
         CAST(day AS TIMESTAMP) + INTERVAL 36 HOUR AS wend
  FROM top3
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
FROM events, win
WHERE ts >= wstart AND ts < wend
GROUP BY 1""",
)
def _q_spike_windows(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(25,6)")).alias("v")
    )
    top3 = daily.orderBy(F.col("v").desc(), F.col("day")).limit(3)
    win = top3.select(
        F.to_timestamp(F.concat(F.col("day"), F.lit(" 12:00:00"))).alias("wstart"),
        (F.to_timestamp("day") + F.expr("INTERVAL 36 HOURS")).alias("wend"),
    )
    matched = _interval_bin_join(ev, win, "ts", "wstart", "wend", bin_hours=24)
    return matched.groupBy(
        F.date_format("wstart", "yyyy-MM-dd HH:mm:ss").alias("window_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
    )


@_entry(
    "asof_spend_enrichment",
    "As-of join: each CRM opportunity enriched with the latest known daily "
    "ads spend for its UTM triple at-or-before created_at — union-window "
    "plan (ONE shuffle), not a quadratic range join.",
    f"""WITH {_ADS_CTE},
{_CRM_CTE},
daily_spend AS (
  SELECT utm_campaign, utm_source, utm_medium,
         CAST(date || ' 00:00:00' AS TIMESTAMP) AS sts,
         {_DSUM.format(x='cost')} AS day_cost
  FROM ads_ch GROUP BY 1, 2, 3, 4
),
tagged AS (
  SELECT utm_campaign, utm_source, utm_medium, sts AS _ts, 0 AS _tag,
         NULL AS opportunity_id, NULL AS stage, NULL::TIMESTAMP AS created_at,
         day_cost AS r_cost
  FROM daily_spend
  UNION ALL
  SELECT utm_campaign, utm_source, utm_medium, created_at AS _ts, 1 AS _tag,
         opportunity_id, stage, created_at, NULL AS r_cost
  FROM crm
),
win AS (
  SELECT *, last_value(r_cost IGNORE NULLS) OVER (
           PARTITION BY utm_campaign, utm_source, utm_medium
           ORDER BY _ts, _tag ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS day_cost_asof
  FROM tagged
)
SELECT opportunity_id, stage,
       strftime(created_at, '%Y-%m-%d %H:%M:%S.%f') AS created_at_str,
       utm_campaign, utm_source, utm_medium, day_cost_asof
FROM win WHERE opportunity_id IS NOT NULL""",
)
def _q_asof(spark, sf_dir):
    ads, crm = _ads(spark, sf_dir), _crm(spark, sf_dir)
    daily = (
        ads.groupBy("utm_campaign", "utm_source", "utm_medium",
                    F.to_timestamp("date").alias("sts"))
        .agg(F.sum(F.col("cost").cast("decimal(25,6)")).cast("double").alias("day_cost"))
    )
    out = _asof_join(
        crm.select("opportunity_id", "stage", "created_at",
                   "utm_campaign", "utm_source", "utm_medium"),
        daily,
        on=["utm_campaign", "utm_source", "utm_medium"],
        left_ts="created_at",
        right_ts="sts",
        right_payload=["day_cost"],
    )
    return out.select(
        "opportunity_id",
        "stage",
        F.date_format("created_at", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("created_at_str"),
        "utm_campaign",
        "utm_source",
        "utm_medium",
        F.col("day_cost_asof"),
    )


# -- late additions: q21-style decorrelation, PII redaction, line dedup -----

@_entry(
    "q21_late_sole_suppliers",
    "TPC-H Q21 (adapted): sole late shipper on finished multi-supplier "
    "orders — two correlated EXISTS decorrelated into ONE per-order hash "
    "aggregate (countDistinct + max over the one-element late set).",
    """WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                             THEN l_suppkey END) AS n_late_supp,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN l_suppkey END) AS late_suppkey
  FROM lineitem
  JOIN (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F') o
    ON l_orderkey = o_orderkey
  GROUP BY 1
)
SELECT s_name, n_name AS nation, numwait
FROM (SELECT late_suppkey, COUNT(*) AS numwait
      FROM per_order WHERE n_supp > 1 AND n_late_supp = 1 GROUP BY 1) w
JOIN supplier ON late_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey""",
)
def _q21(spark, sf_dir):
    return analytics.q21_late_sole_suppliers(
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "nation"),
    )


#: deterministic PII-bearing corpus view — the synthetic documents contain no
#: real PII, so both engines append the SAME derived contact strings before
#: redaction (mirrors the synthetic ads/CRM construction pattern).
_PII_DOCS_SPARK = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', CAST(doc_id AS STRING), '@example.com') ELSE '' END,"
    " CASE WHEN doc_id % 5 = 0 THEN concat(' from 10.', CAST(doc_id % 200 AS STRING), '.0.', CAST(doc_id % 100 AS STRING)) ELSE '' END,"
    " CASE WHEN doc_id % 7 = 0 THEN concat(' call +3460012', lpad(CAST(doc_id % 100 AS STRING), 2, '0')) ELSE '' END"
    ") AS text"
)

_PII_DOCS_DUCK = """
pii_docs AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' call +3460012' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ELSE '' END
         AS text
  FROM documents
)"""

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4 = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
_PII_PHONE = "\\+\\d(?:[-. ()]{0,2}\\d){6,14}"


@_entry(
    "redact_pii",
    "Training-corpus PII scrub: emails / IPv4 / phone numbers replaced by "
    "typed placeholders + per-doc counts.  Row-local regexp projection, "
    "no shuffle, no UDF.",
    f"""WITH {_PII_DOCS_DUCK}
SELECT doc_id,
       len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
       len(regexp_extract_all(text, '{_PII_IPV4}')) AS n_ipv4,
       len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
       len(regexp_extract_all(text, '{_PII_EMAIL}'))
         + len(regexp_extract_all(text, '{_PII_IPV4}'))
         + len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_pii,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IPV4}', '<IPV4>', 'g'),
         '{_PII_PHONE}', '<PHONE>', 'g') AS text_redacted
FROM pii_docs""",
)
def _q_redact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").selectExpr("doc_id", _PII_DOCS_SPARK)
    return _tx.redact_pii(docs)


@_entry(
    "line_dedup_stats",
    "CCNet-style line-level duplication profile (3-token pseudo-lines on "
    "this single-line corpus): per-doc count/fraction of lines appearing "
    "in other documents.  Lines reduce to 60-bit hashes before any "
    "shuffle — text never moves.",
    f"""WITH tok AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
),
segs AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(toks) / 3.0) AS INT)),
                        i -> array_to_string(toks[i*3+1:i*3+3], ' ')) AS lines
  FROM tok
),
lines AS (
  SELECT doc_id, {_duck_hex60('line')} AS h
  FROM (SELECT doc_id, unnest(lines) AS line FROM segs)
),
dups AS (SELECT h FROM lines GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1),
flagged AS (
  SELECT doc_id, COUNT(*) AS n_dup_lines
  FROM lines WHERE h IN (SELECT h FROM dups) GROUP BY doc_id
),
totals AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT t.doc_id, n_lines, COALESCE(n_dup_lines, 0) AS n_dup_lines,
       CAST(COALESCE(n_dup_lines, 0) AS DOUBLE) / n_lines AS dup_line_fraction
FROM totals t LEFT JOIN flagged f ON t.doc_id = f.doc_id""",
)
def _q_linededup(spark, sf_dir):
    return _tx.line_dedup_stats(_t(spark, sf_dir, "documents"), segment_tokens=3)


@_entry(
    "repeated_ngram_spans",
    "Exact-substring (repeated-span) duplication profile: per-doc count of "
    "8-token spans occurring verbatim in ≥2 documents and the fraction of "
    "the doc's tokens covered by such spans (interval union via one LEAD "
    "window).  The suffix-array-dedup signal, expressed as positional "
    "n-gram hashing so both shuffles move hashes, never text.",
    f"""WITH tok AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
),
pos AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) < 8 THEN [] ELSE range(1, len(t) - 6) END) AS pos,
         t
  FROM tok
),
sh AS (
  SELECT doc_id, pos,
         {_duck_hex60("array_to_string(t[pos:pos+7], ' ')")} AS h
  FROM pos
),
dups AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos FROM sh WHERE h IN (SELECT h FROM dups)),
fresh AS (
  SELECT doc_id, pos,
         LEAST(8, COALESCE(LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) - pos, 8)) AS fresh
  FROM hits
),
cov AS (
  SELECT doc_id, COUNT(*) AS n_dup_ngrams,
         CAST(SUM(fresh) AS BIGINT) AS covered_tokens
  FROM fresh GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
       COALESCE(n_dup_ngrams, 0) AS n_dup_ngrams,
       COALESCE(covered_tokens, 0) AS covered_tokens,
       CASE WHEN len(t.t) > 0 THEN
         CAST(COALESCE(covered_tokens, 0) AS DOUBLE) / len(t.t) END AS dup_coverage_frac
FROM tok t LEFT JOIN cov ON t.doc_id = cov.doc_id""",
)
def _q_repeated_spans(spark, sf_dir):
    return _tx.repeated_ngram_spans(_t(spark, sf_dir, "documents"), n=8, min_docs=2)


@_entry(
    "remove_repeated_spans",
    "Span-dedup ACTION: rewrite every document with tokens inside "
    "cross-document duplicated 8-grams removed.  Hit detection is "
    "hash-side; the rewrite is one row-local two-arg transform against "
    "the doc's own sorted start array.",
    f"""WITH tok AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
),
pos AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) < 8 THEN [] ELSE range(1, len(t) - 6) END) AS pos,
         t
  FROM tok
),
sh AS (
  SELECT doc_id, pos,
         {_duck_hex60("array_to_string(t[pos:pos+7], ' ')")} AS h
  FROM pos
),
dups AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, pos FROM sh WHERE h IN (SELECT h FROM dups)),
tokpos AS (
  SELECT doc_id, unnest(generate_series(1, len(t))) AS p, t FROM tok
),
kept AS (
  SELECT tp.doc_id, tp.p, tp.t[tp.p] AS tok
  FROM tokpos tp
  ANTI JOIN (SELECT DISTINCT tp2.doc_id, tp2.p
             FROM tokpos tp2 JOIN hits h
               ON tp2.doc_id = h.doc_id AND tp2.p BETWEEN h.pos AND h.pos + 7) r
    ON tp.doc_id = r.doc_id AND tp.p = r.p
),
clean AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed_tokens,
       COALESCE(text_clean, '') AS text_clean
FROM tok t LEFT JOIN clean ON t.doc_id = clean.doc_id""",
)
def _q_remove_spans(spark, sf_dir):
    return _tx.remove_repeated_spans(_t(spark, sf_dir, "documents"), n=8, min_docs=2)


@_entry(
    "events_trailing_window_load",
    "RANGE (time-interval) window frame: per-event trailing 60-min "
    "count/value per user, ordered by epoch microseconds (exact integer "
    "frame bounds, peer-inclusive ties in both engines).",
    """SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       COUNT(*) OVER w AS n_trailing,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS value_trailing
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
)
def _q_trailing(spark, sf_dir):
    return analytics.events_trailing_window_load(load_events(spark, sf_dir))


# planted distance-1 typo docs, appended identically on both engines so the
# sf0.01 oracle comparison is non-vacuous (the synthetic corpus vocabulary
# alone yields zero pairs, which would prove nothing)
_TYPO_PLANT_ROWS = [
    (900000001, "qqzzword qqzzwore melonade melonadr distributedx"),
    (900000002, "qqzzword melonade shufflez shufflex"),
]
_TYPO_PLANT_SQL = " UNION ALL ".join(
    f"SELECT CAST({i} AS BIGINT) AS doc_id, '{t}' AS text"
    for i, t in _TYPO_PLANT_ROWS
)


@_entry(
    "token_typo_pairs",
    "Blocked fuzzy self-join over the corpus vocabulary: distance-1 "
    "Levenshtein pairs via first/last-char block keys — per-block "
    "quadratic, never global.  Planted typo docs keep the oracle gate "
    "non-vacuous.",
    f"""WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL {_TYPO_PLANT_SQL}
),
vocab AS (
  SELECT token, COUNT(*) AS n_docs FROM (
    SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS token FROM corpus
  ) GROUP BY token
),
blocked AS (
  SELECT token, n_docs,
         unnest(['F' || left(token, 1), 'L' || right(token, 1)]) AS blk
  FROM vocab
)
SELECT DISTINCT a.token AS token_a, b.token AS token_b,
       levenshtein(a.token, b.token) AS distance,
       a.n_docs AS n_a, b.n_docs AS n_b
FROM blocked a JOIN blocked b USING (blk)
WHERE a.token < b.token
  AND abs(length(a.token) - length(b.token)) <= 1
  AND levenshtein(a.token, b.token) <= 1""",
)
def _q_typos(spark, sf_dir):
    planted = spark.createDataFrame(_TYPO_PLANT_ROWS, "doc_id long, text string")
    corpus = _t(spark, sf_dir, "documents").select("doc_id", "text").unionByName(planted)
    return _tx.token_typo_pairs(corpus)


@_entry(
    "events_distinct_rollup_sketched",
    "Mergeable Datasketches-HLL rollup: per-day distinct-user sketches + "
    "an 'ALL' row from hll_union_agg over the daily sketches (one raw "
    "scan, any coarser grain from stored sketches).  Released as the "
    "deterministic bound-check frame (exact count per grain + "
    "hll_within_tol at 3 sigma) so the entry carries a hash-exact "
    "oracle while the full sketch dataflow — per-day sketches, the "
    "union merge, the estimates — still runs engine-side; pytest "
    "additionally pins union-of-parts == sketch-of-whole.",
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       COUNT(*) AS n_events,
       CAST(1 AS INTEGER) AS hll_within_tol
FROM events GROUP BY 1
UNION ALL
SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT), COUNT(*),
       CAST(1 AS INTEGER)
FROM events""",
)
def _q_sketch_rollup(spark, sf_dir):
    return analytics.events_distinct_rollup_checked(load_events(spark, sf_dir))


@_entry(
    "events_latest_per_user",
    "CDC latest-record compaction: row_number over (user_id → ts DESC, "
    "event_id DESC) = 1 — the upsert/current-state primitive; one "
    "key-partitioned shuffle, exchange-free when input is bucketed.",
    """SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       event_type, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1""",
)
def _q_latest(spark, sf_dir):
    return analytics.events_latest_per_user(load_events(spark, sf_dir))


@_entry(
    "q16_supplier_part_counts",
    "TPC-H Q16 (adapted, lineitem-derived part↔supplier relation): "
    "distinct-pair reduction BEFORE the dim join and counting agg — the "
    "fact table collapses to a catalog relation first.",
    """WITH links AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM links JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
GROUP BY p_brand, p_type, p_size""",
)
def _q16(spark, sf_dir):
    return analytics.q16_supplier_part_counts(
        _t(spark, sf_dir, "part"), _t(spark, sf_dir, "lineitem")
    )


@_entry(
    "q2_min_cost_supplier",
    "TPC-H Q2 (adapted, lineitem-derived offer relation): correlated "
    "min-cost subquery decorrelated into argmin-by-part over the region's "
    "offers; dims broadcast, only (partkey, suppkey) pairs shuffle.",
    """WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
offers AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2
),
eu_offers AS (
  SELECT o.l_partkey, o.cost, s.s_name, s.s_acctbal, s.n_name
  FROM offers o JOIN eu_supp s ON o.l_suppkey = s.s_suppkey
),
best AS (SELECT l_partkey, MIN(cost) AS min_cost FROM eu_offers GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, min_cost
FROM eu_offers e
JOIN best b ON e.l_partkey = b.l_partkey AND e.cost = b.min_cost
JOIN part ON e.l_partkey = p_partkey
WHERE p_type = 'STANDARD' AND p_size IN (5, 15, 25, 35, 45)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100""",
)
def _q2(spark, sf_dir):
    return analytics.q2_min_cost_supplier(
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
        _t(spark, sf_dir, "lineitem"),
    )


@_entry(
    "q11_important_parts",
    "TPC-H Q11 (adapted, scale-free threshold): per-part decimal value "
    "through one region's suppliers, HAVING value × n_parts × 2 > 3 × "
    "total — the scalar-subquery threshold as exact decimal×integer "
    "arithmetic, broadcast back via 1-row cross join.",
    """WITH reg_supp AS (
  SELECT s_suppkey
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
vals AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS value_dec
  FROM lineitem JOIN reg_supp ON l_suppkey = s_suppkey
  GROUP BY 1
),
totals AS (SELECT SUM(value_dec) AS grand_total, COUNT(*) AS n_parts FROM vals)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS stock_value
FROM vals, totals
WHERE value_dec * n_parts * 2 > 3 * grand_total""",
)
def _q11(spark, sf_dir):
    return analytics.q11_important_parts(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@_entry(
    "q20_promotable_suppliers",
    "TPC-H Q20 (adapted): nested semi-join — (supp, part) pairs of a "
    "name-filtered part family whose one-year shipped quantity exceeds "
    "half their all-time total (one conditional-agg pass, exact decimal "
    "compare), semi-joined to the region's suppliers.",
    """WITH fam AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
flows AS (
  SELECT l_suppkey,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate < TIMESTAMP '1997-01-01'
                  THEN CAST(l_quantity AS DECIMAL(25,6))
                  ELSE CAST(0 AS DECIMAL(25,6)) END) AS qty_recent,
         SUM(CAST(l_quantity AS DECIMAL(25,6))) AS qty_all
  FROM lineitem JOIN fam ON l_partkey = p_partkey
  GROUP BY l_suppkey, l_partkey
),
hot AS (SELECT DISTINCT l_suppkey FROM flows WHERE 2 * qty_recent > qty_all)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (SELECT l_suppkey FROM hot)""",
)
def _q20(spark, sf_dir):
    return analytics.q20_promotable_suppliers(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "part"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@_entry(
    "events_grouping_sets",
    "Explicit GROUPING SETS ((day,type),(day),(type)) — non-lattice "
    "grouping with grouping_id; one Expand + one hash agg, no second "
    "pass per set.",
    """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
       GROUPING(strftime(ts, '%Y-%m-%d')) * 2 + GROUPING(event_type) AS gid
FROM events
GROUP BY GROUPING SETS ((1, event_type), (1), (event_type))""",
)
def _q_gsets(spark, sf_dir):
    return analytics.events_grouping_sets(load_events(spark, sf_dir))


@_entry(
    "events_unpivot_daily",
    "UNPIVOT/melt: the wide pivot table back to sparse long form — "
    "row-local Expand, loss-free round trip (equals the plain day×type "
    "aggregate).",
    """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n_events
FROM events
WHERE event_type IN ('click', 'view', 'signup', 'purchase', 'error')
GROUP BY 1, 2""",
)
def _q_unpivot(spark, sf_dir):
    return analytics.events_unpivot_daily(load_events(spark, sf_dir))


@_entry(
    "documents_contiguous_ids",
    "Dense ordered surrogate keys at scale: range-repartition + "
    "per-partition row_number + tiny offset cumsum — no empty-PARTITION-BY "
    "window (which funnels 100 TB through one task).  Equals the "
    "single-window answer for a total order.",
    """SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY doc_id) AS row_id
FROM documents""",
)
def _q_contig_ids(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return analytics.assign_contiguous_ids(docs, ["doc_id"])


@_entry(
    "events_daily_gapfill",
    "Dense calendar spine + gap filling: sequence()-exploded date spine "
    "left-joined to the day-grain aggregate, NULL-skipping last() "
    "forward fill and exact running total — post-aggregation, nothing "
    "touches fact rows.",
    """WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(25,6))) AS v_dec
  FROM events GROUP BY 1
),
spine AS (
  SELECT strftime(d, '%Y-%m-%d') AS day
  FROM (SELECT unnest(generate_series(CAST(MIN(day) AS DATE),
                                      CAST(MAX(day) AS DATE),
                                      INTERVAL 1 DAY)) AS d
        FROM daily)
)
SELECT s.day,
       COALESCE(n, 0) AS n_events,
       COALESCE(CAST(v_dec AS DOUBLE), 0.0) AS day_value,
       CAST(last_value(v_dec IGNORE NULLS) OVER w AS DOUBLE) AS last_observed_value,
       CAST(SUM(COALESCE(v_dec, 0)) OVER w AS DOUBLE) AS running_value
FROM spine s LEFT JOIN daily d ON s.day = d.day
WINDOW w AS (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
)
def _q_gapfill(spark, sf_dir):
    return analytics.events_daily_gapfill(load_events(spark, sf_dir))


@_entry(
    "events_value_histogram",
    "Equi-width histogram per event_type: row-local bin arithmetic + one "
    "hash aggregate; clamp bins for outliers.",
    """SELECT event_type,
       CAST(CASE WHEN value < 0.0 THEN -1
                 ELSE LEAST(FLOOR(value / 5.0), 19) END AS BIGINT) AS bin,
       0.0 + CAST(CASE WHEN value < 0.0 THEN -1
                       ELSE LEAST(FLOOR(value / 5.0), 19) END AS BIGINT) * 5.0 AS bin_lo,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2, 3""",
)
def _q_hist(spark, sf_dir):
    return analytics.events_value_histogram(load_events(spark, sf_dir))


# -- round-4 continuation: graded contamination, ER blocking, exact joins ----

@_entry(
    "contamination_scores",
    "Graded benchmark contamination: fraction of each training doc's "
    "distinct 8-shingles appearing in the eval split (doc_id%50=0); "
    "broadcast probe, one corpus scan, one aggregation.",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sg AS (SELECT doc_id, {_duck_shingles_k(8)} AS shingles FROM tok),
shs AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg),
bench AS (SELECT DISTINCT unnest(sh) AS h FROM shs WHERE doc_id % 50 = 0),
rows_ AS (SELECT doc_id, unnest(sh) AS h FROM shs WHERE doc_id % 50 <> 0),
per AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(COUNT(CASE WHEN h IN (SELECT h FROM bench) THEN 1 END) AS BIGINT) AS n_overlap
  FROM rows_ GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(n_shingles, 0) AS n_shingles,
       COALESCE(n_overlap, 0) AS n_overlap,
       CASE WHEN COALESCE(n_shingles, 0) = 0 THEN 0.0
            ELSE CAST(n_overlap AS DOUBLE) / n_shingles END AS contamination_frac
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
WHERE d.doc_id % 50 <> 0""",
)
def _q_contamination_scores(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return _tx.contamination_scores(
        docs.filter("doc_id % 50 != 0"), docs.filter("doc_id % 50 = 0"), k=8
    )


@_entry(
    "sorted_neighborhood_pairs",
    "Sorted-neighborhood ER blocking: per-block (first sortkey char) sort, "
    "each record pairs with its next 2 neighbors, exact Jaccard verify — "
    "no global sort, no all-pairs.",
    f"""WITH keyed AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS sortkey
  FROM documents
),
blk AS (SELECT doc_id, sortkey, substr(sortkey, 1, 1) AS block FROM keyed),
leads AS (
  SELECT block, doc_id AS doc_l,
         unnest([LEAD(doc_id, 1) OVER w, LEAD(doc_id, 2) OVER w]) AS doc_r
  FROM blk
  WINDOW w AS (PARTITION BY block ORDER BY sortkey, doc_id)
),
cands AS (
  SELECT DISTINCT block, LEAST(doc_l, doc_r) AS doc_a,
         GREATEST(doc_l, doc_r) AS doc_b
  FROM leads WHERE doc_r IS NOT NULL
),
tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sg AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM tok),
shs AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg)
SELECT doc_a, doc_b, block,
       CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE) /
       (len(sa.sh) + len(sb.sh) - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))) AS jaccard
FROM cands
JOIN shs sa ON sa.doc_id = cands.doc_a
JOIN shs sb ON sb.doc_id = cands.doc_b
WHERE len(sa.sh) + len(sb.sh) > 0""",
)
def _q_snm_pairs(spark, sf_dir):
    return _tx.sorted_neighborhood_pairs(_t(spark, sf_dir, "documents"), window=2)


@_entry(
    "prefix_jaccard_pairs",
    "EXACT Jaccard self-join via prefix filtering (AllPairs/PPJoin): "
    "equi-join on rarest-first prefix shingles + exact verify — output "
    "identical to brute force, never all-pairs.  Oracle IS brute force.",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sg AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM tok),
shs AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
         len(a.sh) AS la, len(b.sh) AS lb
  FROM shs a JOIN shs b ON a.doc_id < b.doc_id
  WHERE len(a.sh) + len(b.sh) > 0
)
SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (la + lb - inter) AS jaccard
FROM pairs
WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.5""",
)
def _q_prefix_jaccard(spark, sf_dir):
    return _tx.prefix_filter_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5
    )


@_entry(
    "events_type_transitions",
    "First-order Markov transitions per user stream: lag window (one "
    "shuffle) -> |types|^2 aggregate -> conditional probabilities.",
    """WITH pairs AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
),
agg AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_transitions,
       CAST(n_transitions AS DOUBLE) /
       SUM(n_transitions) OVER (PARTITION BY prev_type) AS p_transition
FROM agg""",
)
def _q_type_transitions(spark, sf_dir):
    return analytics.events_type_transitions(load_events(spark, sf_dir))


def _duck_rp_sql(out_dim: int = 16) -> str:
    from admira_etl_project_prueba_spark.operators.similarity import _rp_signs

    comps = []
    for i, row in enumerate(_rp_signs(out_dim)):
        lit = "[" + ", ".join(f"{s}.0" for s in row) + "]"
        comps.append(
            f"list_sum(list_transform(range(1, 65), j -> embedding[j] * {lit}[j]))"
            f" / sqrt(CAST({out_dim} AS DOUBLE)) AS p{i}"
        )
    return "SELECT vec_id, label,\n       " + ",\n       ".join(comps) + "\nFROM embeddings"


@_entry(
    "embeddings_random_projection",
    "Johnson-Lindenstrauss +-1 random projection 64->16 dims: sign matrix "
    "is a deterministic plan literal, scan -> project, no shuffle/UDF; "
    "+-1 multiplies are IEEE-exact so the output is bit-reproducible.",
    _duck_rp_sql(),
)
def _q_random_projection(spark, sf_dir):
    from admira_etl_project_prueba_spark.operators.similarity import random_projection

    return random_projection(_t(spark, sf_dir, "embeddings"), out_dim=16)


@_entry(
    "events_zorder_keys",
    "Z-order (Morton) clustering key over (user_id, epoch-day): row-local "
    "bit interleave, exact in int64 — sort by zkey keeps parquet row-group "
    "min/max tight on BOTH columns (the OPTIMIZE ZORDER primitive).",
    """WITH keyed AS (
  SELECT event_id, user_id,
         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day_idx
  FROM events
)
SELECT event_id, user_id, day_idx,
       CAST(list_sum(list_transform(range(0, 20), k -> ((user_id >> k) & 1) << (k * 2 + 0))) +
            list_sum(list_transform(range(0, 20), k -> ((day_idx >> k) & 1) << (k * 2 + 1)))
            AS BIGINT) AS zkey
FROM keyed""",
)
def _q_zorder(spark, sf_dir):
    from admira_etl_project_prueba_spark.operators.layout import zorder_keys

    keyed = load_events(spark, sf_dir).selectExpr(
        "event_id",
        "user_id",
        "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT) AS day_idx",
    )
    return zorder_keys(keyed, ["user_id", "day_idx"], bits=20)


def _duck_pagerank_sql(iters: int = 3, damping: float = 0.85) -> str:
    """Unrolled power-iteration oracle mirroring graph.pagerank exactly:
    decimal-summed contributions + dangling mass, double rank updates."""
    tele = 1.0 - damping
    parts = [
        """WITH edges AS (
  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 1000000 AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
nodes AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM edges
                             UNION ALL SELECT dst FROM edges)
),
n AS (SELECT COUNT(*) AS nn FROM nodes),
outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn AS rank FROM nodes, n)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f""",
c{i} AS (
  SELECT dst AS node, SUM(CAST(CAST({damping!r} AS DOUBLE) * rank / deg
                             AS DECIMAL(25,6))) AS s
  FROM edges e JOIN r{i-1} r ON e.src = r.node
  JOIN outdeg od ON e.src = od.src
  GROUP BY dst
),
d{i} AS (
  SELECT COALESCE(SUM(CAST(rank AS DECIMAL(25,6))), 0) AS dm
  FROM r{i-1} WHERE node NOT IN (SELECT src FROM outdeg)
),
r{i} AS (
  SELECT nodes.node,
         CAST({tele!r} AS DOUBLE) / nn
           + CAST(COALESCE(s, CAST(0 AS DECIMAL(25,6))) AS DOUBLE)
           + CAST({damping!r} AS DOUBLE) * CAST(dm AS DOUBLE) / nn AS rank
  FROM nodes LEFT JOIN c{i} USING (node), n, d{i}
)""")
    parts.append(f"\nSELECT node, rank FROM r{iters}")
    return "".join(parts)


@_entry(
    "trade_pagerank",
    "Fixed-iteration PageRank over the supplier->customer shipment graph "
    "(lineitem x orders): per round ONE (dst, contribution) shuffle + a "
    "1-row dangling aggregate; decimal-exact sums make every iteration "
    "bit-reproducible across engines and partitionings.",
    _duck_pagerank_sql(),
)
def _q_pagerank(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(o, li.l_orderkey == o.o_orderkey).selectExpr(
        "l_suppkey AS src", "o_custkey + 1000000 AS dst"
    )
    return _graph.pagerank(edges, iters=3)


def _duck_cms_sql(depth: int = 4, width: int = 1024) -> str:
    probes = ", ".join(f"('{t}')" for t in _tx.STOPWORDS)
    h0 = _duck_hex60("token")
    cells = " UNION ALL ".join(
        f"SELECT {r} AS r, (({2*r+1} * h + {1000*r+7}) % 2147483647) % {width} AS bucket FROM th"
        for r in range(depth)
    )
    probe_cells = " UNION ALL ".join(
        f"SELECT token, {r} AS r, (({2*r+1} * h + {1000*r+7}) % 2147483647) % {width} AS bucket FROM ph"
        for r in range(depth)
    )
    return f"""WITH probe AS (SELECT token FROM (VALUES {probes}) AS p(token)),
toks AS (
  SELECT unnest({_DUCK_TOKS}) AS token FROM documents
),
th AS (SELECT {h0} % 2147483647 AS h FROM toks),
ph AS (SELECT token, {h0} % 2147483647 AS h FROM probe),
cells AS ({cells}),
sketch AS (SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM cells GROUP BY r, bucket),
pc AS ({probe_cells}),
est AS (
  SELECT pc.token, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS cms_count
  FROM pc LEFT JOIN sketch ON pc.r = sketch.r AND pc.bucket = sketch.bucket
  GROUP BY pc.token
),
exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count FROM toks GROUP BY token)
SELECT est.token, cms_count, COALESCE(exact_count, 0) AS exact_count
FROM est LEFT JOIN exact ON est.token = exact.token"""


@_entry(
    "cms_stopword_counts",
    "Count-min sketch (4x1024, md5 hash rows) point-queried for the "
    "stopword list vs exact counts: fixed-size linear sketch replaces the "
    "unbounded-vocabulary aggregate; merge across shards is elementwise.",
    _duck_cms_sql(),
)
def _q_cms(spark, sf_dir):
    return _tx.cms_estimate(
        _t(spark, sf_dir, "documents"), list(_tx.STOPWORDS)
    )


@_entry(
    "events_session_funnel",
    "Within-session ORDERED funnel (view -> click-after-view -> "
    "purchase-after-click): sessionize core + three window passes over "
    "the same (user, session) partitioning — still ONE shuffle.",
    """WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         CASE WHEN LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
                   OR epoch_us(CAST(ts AS TIMESTAMP)) - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
),
w1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END) OVER sw AS t1
       FROM sess WINDOW sw AS (PARTITION BY user_id, session_id)),
w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND us > t1 THEN us END) OVER sw AS t2
       FROM w1 WINDOW sw AS (PARTITION BY user_id, session_id)),
w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END) OVER sw AS t3
       FROM w2 WINDOW sw AS (PARTITION BY user_id, session_id)),
per AS (SELECT user_id, session_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        FROM w3 GROUP BY user_id, session_id)
SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                 WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS steps_completed,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM per GROUP BY 1""",
)
def _q_session_funnel(spark, sf_dir):
    return analytics.events_session_funnel(load_events(spark, sf_dir))


@_entry(
    "events_anomaly_mad",
    "Robust daily-volume anomalies: modified z-score 0.6745*(x-med)/MAD "
    "per type (50% breakdown point vs mean/std); exact percentiles, "
    "broadcast stats join, no history window.",
    """WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
),
med AS (SELECT event_type, quantile_cont(day_value, 0.5) AS med FROM daily GROUP BY 1),
mad AS (
  SELECT d.event_type, quantile_cont(ABS(day_value - med), 0.5) AS mad, MAX(med) AS med
  FROM daily d JOIN med USING (event_type) GROUP BY d.event_type
)
SELECT d.event_type, day, day_value,
       CASE WHEN mad > 0
            THEN CAST(0.6745 AS DOUBLE) * (day_value - m.med) / mad END AS mscore,
       COALESCE(ABS(CASE WHEN mad > 0
            THEN CAST(0.6745 AS DOUBLE) * (day_value - m.med) / mad END), 0.0) > 3.5 AS is_anomaly
FROM daily d JOIN mad m USING (event_type)""",
)
def _q_anomaly_mad(spark, sf_dir):
    return analytics.events_anomaly_mad(load_events(spark, sf_dir))


@_entry(
    "fk_integrity_audit",
    "Referential-integrity audit over the star schema: per FK, row/NULL/"
    "orphan counts via key-only anti-joins against broadcast parent key "
    "sets — the pre-join data-quality gate.",
    """SELECT 'lineitem.l_orderkey -> orders' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_null_fk,
       CAST(COUNT(CASE WHEN l_orderkey IS NOT NULL
                        AND l_orderkey NOT IN (SELECT o_orderkey FROM orders) THEN 1 END) AS BIGINT) AS n_orphans
FROM lineitem
UNION ALL
SELECT 'lineitem.l_partkey -> part', COUNT(*),
       COUNT(CASE WHEN l_partkey IS NULL THEN 1 END),
       COUNT(CASE WHEN l_partkey IS NOT NULL
                   AND l_partkey NOT IN (SELECT p_partkey FROM part) THEN 1 END)
FROM lineitem
UNION ALL
SELECT 'lineitem.l_suppkey -> supplier', COUNT(*),
       COUNT(CASE WHEN l_suppkey IS NULL THEN 1 END),
       COUNT(CASE WHEN l_suppkey IS NOT NULL
                   AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier) THEN 1 END)
FROM lineitem
UNION ALL
SELECT 'orders.o_custkey -> customer', COUNT(*),
       COUNT(CASE WHEN o_custkey IS NULL THEN 1 END),
       COUNT(CASE WHEN o_custkey IS NOT NULL
                   AND o_custkey NOT IN (SELECT c_custkey FROM customer) THEN 1 END)
FROM orders
UNION ALL
SELECT 'customer.c_nationkey -> nation', COUNT(*),
       COUNT(CASE WHEN c_nationkey IS NULL THEN 1 END),
       COUNT(CASE WHEN c_nationkey IS NOT NULL
                   AND c_nationkey NOT IN (SELECT n_nationkey FROM nation) THEN 1 END)
FROM customer
UNION ALL
SELECT 'supplier.s_nationkey -> nation', COUNT(*),
       COUNT(CASE WHEN s_nationkey IS NULL THEN 1 END),
       COUNT(CASE WHEN s_nationkey IS NOT NULL
                   AND s_nationkey NOT IN (SELECT n_nationkey FROM nation) THEN 1 END)
FROM supplier
UNION ALL
SELECT 'nation.n_regionkey -> region', COUNT(*),
       COUNT(CASE WHEN n_regionkey IS NULL THEN 1 END),
       COUNT(CASE WHEN n_regionkey IS NOT NULL
                   AND n_regionkey NOT IN (SELECT r_regionkey FROM region) THEN 1 END)
FROM nation""",
)
def _q_fk_audit(spark, sf_dir):
    names = ("lineitem", "orders", "part", "supplier", "customer", "nation", "region")
    return analytics.fk_integrity_audit({n: _t(spark, sf_dir, n) for n in names})


@_entry(
    "corpus_diff",
    "Snapshot diff (added/removed/changed/unchanged): both sides reduce "
    "to (doc_id, md5) before ONE full-outer join — ids and 32-byte "
    "hashes ship, never text.  old = doc_id%7<>0; new = all docs with "
    "text suffixed for doc_id%11=0.",
    """WITH o AS (SELECT doc_id, md5(text) AS h_old FROM documents WHERE doc_id % 7 <> 0),
n AS (SELECT doc_id,
             md5(CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END) AS h_new
      FROM documents)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN h_old IS NULL THEN 'added'
            WHEN h_new IS NULL THEN 'removed'
            WHEN h_old <> h_new THEN 'changed'
            ELSE 'unchanged' END AS status
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""",
)
def _q_corpus_diff(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    old = docs.filter("doc_id % 7 != 0")
    new = docs.selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 11 = 0 THEN concat(text, ' rev2') ELSE text END AS text",
    )
    return _tx.corpus_diff(old, new)


# -- mergeable HyperLogLog sketches (operators/sketches.py) ------------------

from admira_etl_project_prueba_spark.operators import sketches as _sk

#: DuckDB twin of sketches.hll_registers over events.user_id — dense
#: per-group register frame (bucket scaffold via range(m), absent → 0)
def _duck_hll_registers(groups_sql: str, group_cols: str) -> str:
    h = _duck_hex60("CAST(user_id AS VARCHAR)")
    return f"""WITH hashed AS (
  SELECT {groups_sql}, {h} AS h FROM events
),
sparse AS (
  SELECT {group_cols}, CAST(h % {_sk.M} AS INTEGER) AS bucket,
         CAST(MAX(CASE WHEN h // {_sk.M} = 0 THEN {_sk.W + 1}
                       ELSE {_sk.W + 1} - length(bin(h // {_sk.M})) END) AS INTEGER) AS register
  FROM hashed GROUP BY ALL
),
scaffold AS (
  SELECT {group_cols}, CAST(r.range AS INTEGER) AS bucket
  FROM (SELECT DISTINCT {group_cols} FROM sparse) CROSS JOIN range({_sk.M}) r
)
SELECT {group_cols}, bucket, COALESCE(register, 0) AS register
FROM scaffold LEFT JOIN sparse USING ({group_cols}, bucket)"""


def _duck_hll_estimate(groups_sql: str, group_cols: str) -> str:
    regs = _duck_hll_registers(groups_sql, group_cols)
    return f"""WITH regs AS ({regs})
SELECT {group_cols},
       CAST({_sk.NUMERATOR!r} AS DOUBLE) / CAST(CAST(SUM(CAST(1 AS BIGINT) << (52 - register)) AS BIGINT) AS DOUBLE) AS est_distinct,
       CAST(SUM(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_buckets,
       CAST(SUM(CAST(1 AS BIGINT) << (52 - register)) AS BIGINT) AS indicator_scaled
FROM regs GROUP BY ALL"""


@_entry(
    "events_hll_registers",
    "Mergeable HLL sketch REGISTERS per event_type (m=512, HEX60 hash, "
    "integer-exact rho via bin() length): the stored artifact that makes "
    "COUNT(DISTINCT) re-aggregatable without rescanning raw data — "
    "groupBy ships 512 small ints per group, never user ids.",
    _duck_hll_registers("event_type", "event_type"),
)
def _q_hll_registers(spark, sf_dir):
    return _sk.hll_registers(load_events(spark, sf_dir), "user_id", ["event_type"])


@_entry(
    "events_hll_estimate",
    "HLL cardinality estimate per event_type from the register frame: "
    "indicator sum kept EXACT as sum(2^(52-rho)) in int64, so the raw "
    "alpha*m^2/Z estimate is ONE literal/int64 double division — "
    "bit-equal across engines (ln-based small-range correction excluded "
    "from the oracle surface; V is exposed to apply it downstream).",
    _duck_hll_estimate("event_type", "event_type"),
)
def _q_hll_estimate(spark, sf_dir):
    return _sk.hll_distinct(
        load_events(spark, sf_dir), "user_id", ["event_type"], correct_small=False
    )


@_entry(
    "events_hll_merge_days",
    "Sketch MERGE path: per-(type, day) registers max-merged to per-type, "
    "then estimated — same output as the direct sketch, proving unions "
    "of stored daily sketches answer arbitrary rollups without a rescan "
    "(the oracle computes the direct sketch; equality IS the merge proof).",
    _duck_hll_estimate("event_type", "event_type"),
)
def _q_hll_merge_days(spark, sf_dir):
    ev = load_events(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    daily = _sk.hll_registers(ev, "user_id", ["event_type", "day"])
    merged = _sk.hll_merge(daily, ["event_type"])
    return _sk.hll_estimate(merged, ["event_type"], correct_small=False)


# -- triangle counting (operators/graph.py::triangle_counts) -----------------

_DUCK_TRI_LT_UV = "du.deg < dv.deg OR (du.deg = dv.deg AND u < v)"

#: minimum shared orders for a co-supply edge — below this the TPC-H
#: supplier universe (1k suppliers at sf0.1 vs 150k orders) degenerates
#: toward a complete graph, which no triangle algorithm survives; real
#: 100 TB co-occurrence graphs get the same treatment (min-support
#: pruning) for the same reason.
_TRI_MIN_SHARED = 5

_DUCK_TRIANGLES = f"""WITH e AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_SHARED}
),
dg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
       FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
       GROUP BY 1),
o AS (
  SELECT CASE WHEN {_DUCK_TRI_LT_UV} THEN u ELSE v END AS src,
         CASE WHEN {_DUCK_TRI_LT_UV} THEN v ELSE u END AS dst,
         CASE WHEN {_DUCK_TRI_LT_UV} THEN dv.deg ELSE du.deg END AS ddeg
  FROM e JOIN dg du ON e.u = du.node JOIN dg dv ON e.v = dv.node
),
w AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM o e1 JOIN o e2 ON e1.src = e2.src
  WHERE e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst)
),
t AS (SELECT a, b, c FROM w
      WHERE EXISTS (SELECT 1 FROM o WHERE o.src = w.b AND o.dst = w.c)),
pn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
       FROM (SELECT unnest([a, b, c]) AS node FROM t) GROUP BY 1)
SELECT dg.node, dg.deg AS degree,
       COALESCE(n_triangles, 0) AS n_triangles,
       CASE WHEN dg.deg >= 2
            THEN CAST(2 AS DOUBLE) * CAST(COALESCE(n_triangles, 0) AS DOUBLE)
                 / (CAST(dg.deg AS DOUBLE) * CAST(dg.deg - 1 AS DOUBLE)) END
         AS clustering_coeff
FROM dg LEFT JOIN pn USING (node)"""


@_entry(
    "cosupply_triangles",
    "Per-node triangle counts + clustering coefficient over the supplier "
    "repeat-co-supply graph (>= 5 shared orders — min-support pruning "
    "keeps the small TPC-H supplier universe out of the complete-graph "
    "regime): degree-ordered edge orientation bounds every "
    "out-neighborhood by O(sqrt(m)), so wedge fan-out is O(m^1.5) "
    "regardless of power-law skew.  Three shuffles, 2-int tuples only.",
    _DUCK_TRIANGLES,
)
def _q_triangles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # co-supply edges via groupBy + row-local pair expansion: ONE shuffle
    # of lineitem (the self-join shape shuffles it twice) — measured 19%
    # faster end-to-end at sf0.1 with identical edges.  Pair fan-out per
    # row is C(items-per-order, 2), bounded by the max order size (~7 in
    # TPC-H), so no row explodes; a genuinely hot key would fan out the
    # same total volume under either shape.
    edges = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_suppkey")).alias("s"))
        .selectExpr(
            "explode(flatten(transform(s, (x, i) -> "
            "transform(slice(s, i + 2, size(s)), y -> struct(x AS u, y AS v))"
            "))) AS p"
        )
        .selectExpr("p.u", "p.v")
        .filter("u < v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _TRI_MIN_SHARED)
        .select("u", "v")
    )
    return _graph.triangle_counts(edges, "u", "v")


# -- BM25 ranked retrieval (textops.bm25_rank) -------------------------------

_BM25_TERMS = ("spark", "shuffle", "join")


def _duck_bm25_sql(terms=_BM25_TERMS, k1=1.2, b=0.75, top_n=20) -> str:
    tlist = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    return f"""WITH dl AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks,
         CAST(len({_DUCK_TOKS}) AS BIGINT) AS dl
  FROM documents
),
stats AS (
  SELECT CAST(SUM(CAST(dl AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avgdl,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM dl
),
tf AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl,
               unnest(list_filter(toks, x -> list_contains({tlist}, x))) AS term
        FROM dl)
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT doc_id,
         SUM(CAST((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
             * (CAST(tf AS DOUBLE) * CAST({k1 + 1.0!r} AS DOUBLE))
             / (CAST(tf AS DOUBLE) + CAST({k1!r} AS DOUBLE)
                * (CAST({1.0 - b!r} AS DOUBLE)
                   + CAST({b!r} AS DOUBLE) * CAST(dl AS DOUBLE) / avgdl))
             AS DECIMAL(25,6))) AS s,
         CAST(COUNT(*) AS BIGINT) AS n_terms_matched
  FROM tf JOIN dfreq USING (term), stats
  GROUP BY doc_id
)
SELECT doc_id, CAST(s AS DOUBLE) AS bm25_score, n_terms_matched
FROM scored ORDER BY s DESC, doc_id LIMIT {top_n}"""


@_entry(
    "bm25_search",
    "Ranked retrieval: rational-idf BM25 (ln-free RSJ weight — identical "
    "per-term ranking, IEEE-reproducible scores) for a literal query-term "
    "list.  ONE corpus scan: row-local array filter before the explode "
    "ships (doc, term, tf) for matching docs only; corpus stats are a "
    "1-row broadcast; decimal term-sum.",
    _duck_bm25_sql(),
)
def _q_bm25(spark, sf_dir):
    return _tx.bm25_rank(_t(spark, sf_dir, "documents"), list(_BM25_TERMS))


# -- deterministic weighted (PPS) sampling (textops.pps_sample) --------------

_PPS_RATE = 0.001


@_entry(
    "pps_sample",
    "Deterministic Poisson PPS sample of documents, p = min(1, rate * "
    "n_chars): integer inclusion test hex60(key|salt) %% 1e6 < floor(p * "
    "1e6) — bit-reproducible across engines/partitionings, row-local "
    "(no shuffle), with Horvitz-Thompson 1/p weights for unbiased "
    "downstream sums.",
    f"""SELECT doc_id, source, lang, n_chars,
       LEAST(CAST(1.0 AS DOUBLE), CAST({_PPS_RATE!r} AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS inclusion_prob,
       CAST(1.0 AS DOUBLE) / LEAST(CAST(1.0 AS DOUBLE), CAST({_PPS_RATE!r} AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS ht_weight
FROM documents
WHERE {_duck_hex60("CAST(doc_id AS VARCHAR) || '|pps'")} % 1000000
      < CAST(floor(LEAST(CAST(1.0 AS DOUBLE), CAST({_PPS_RATE!r} AS DOUBLE) * CAST(n_chars AS DOUBLE)) * 1000000) AS BIGINT)""",
)
def _q_pps_sample(spark, sf_dir):
    return _tx.pps_sample(
        _t(spark, sf_dir, "documents").select("doc_id", "source", "lang", "n_chars"),
        weight="n_chars",
        rate=_PPS_RATE,
    )


# -- SCD2 dimension handling (operators/scd.py) ------------------------------

from admira_etl_project_prueba_spark.operators import scd as _scd

_DUCK_SCD2_DIM = """WITH u AS (
  SELECT user_id, event_type AS status,
         epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(CAST(ts AS TIMESTAMP))
                            ORDER BY event_id DESC) AS rn
  FROM events
),
latest AS (SELECT user_id, status, valid_from_us FROM u WHERE rn = 1),
chg AS (
  SELECT *, LAG(status) OVER w AS prev
  FROM latest WINDOW w AS (PARTITION BY user_id ORDER BY valid_from_us)
),
comp AS (SELECT user_id, status, valid_from_us FROM chg
         WHERE prev IS DISTINCT FROM status)
SELECT user_id, status, valid_from_us,
       LEAD(valid_from_us) OVER w AS valid_to_us,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
       (LEAD(valid_from_us) OVER w) IS NULL AS is_current
FROM comp WINDOW w AS (PARTITION BY user_id ORDER BY valid_from_us)"""


def _scd2_dim(spark, sf_dir):
    ev = load_events(spark, sf_dir).selectExpr(
        "user_id",
        "event_type AS status",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "event_id",
    )
    return _scd.scd2_build(ev, "user_id", ["status"], "us", "event_id")


@_entry(
    "scd2_user_status",
    "Type-2 dimension from the event change log: same-instant dedup -> "
    "change compression (consecutive equal attrs dropped) -> versioned "
    "half-open [valid_from, valid_to) intervals; ONE shuffle on the key "
    "drives all four window steps.  Integer microsecond time keeps the "
    "whole surface exact.",
    _DUCK_SCD2_DIM,
)
def _q_scd2_dim(spark, sf_dir):
    return _scd2_dim(spark, sf_dir)


@_entry(
    "scd2_point_in_time",
    "Point-in-time enrichment: each purchase fact joined to the status "
    "version valid at fact time.  NOT a range join (non-equi = nested "
    "loop at scale) — reuses the union + single-window as-of core; a "
    "fact at exactly valid_from sees the new version.",
    f"""WITH dim AS ({_DUCK_SCD2_DIM}),
f AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS fact_ts_us
      FROM events WHERE event_type = 'purchase')
SELECT f.event_id, f.user_id, f.fact_ts_us,
       d.status AS status_asof, d.version AS version_asof
FROM f ASOF LEFT JOIN dim d
  ON f.user_id = d.user_id AND f.fact_ts_us >= d.valid_from_us""",
)
def _q_scd2_pit(spark, sf_dir):
    facts = load_events(spark, sf_dir).filter("event_type = 'purchase'").selectExpr(
        "event_id", "user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS fact_ts_us"
    )
    dim = _scd2_dim(spark, sf_dir)
    out = _scd.scd2_point_in_time(
        facts, dim, "user_id", "fact_ts_us", payload=["status", "version"]
    )
    return out.select(
        "event_id",
        "user_id",
        "fact_ts_us",
        F.col("status_asof"),
        F.col("version_asof"),
    )


@_entry(
    "events_cohort_retention",
    "Weekly cohort retention with RATES: single user-key shuffle "
    "(first week + distinct-week set aggregated together, row-local "
    "explode) vs events_retention_cohorts' two-frame join formulation "
    "— same family, coarser grain, plus cohort sizes and retention_rate "
    "columns and one fewer shuffle.  Integer week arithmetic.",
    """WITH ua AS (
  SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS aw
  FROM events
),
coh AS (SELECT user_id, MIN(aw) AS cw FROM ua GROUP BY 1),
pairs AS (
  SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
         CAST(datediff('day', cw, aw) // 7 AS INTEGER) AS week_offset
  FROM ua JOIN coh USING (user_id)
),
matrix AS (
  SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active_users
  FROM pairs GROUP BY 1, 2
),
base AS (
  SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, CAST(COUNT(*) AS BIGINT) AS n_cohort_users
  FROM coh GROUP BY 1
)
SELECT cohort_week, week_offset, n_active_users, n_cohort_users,
       CAST(n_active_users AS DOUBLE) / CAST(n_cohort_users AS DOUBLE) AS retention_rate
FROM matrix JOIN base USING (cohort_week)""",
)
def _q_cohort_retention(spark, sf_dir):
    return analytics.events_cohort_retention(load_events(spark, sf_dir))


def _text_index_path(spark, sf_dir) -> str:
    """Build (once per input-content identity) and return the cached
    write_text_index path for sf_dir's documents table.  Same tag rules
    as _ivf_index_path: digest every data file's (relpath, size,
    mtime_ns) + a format version; build into a temp dir and atomically
    rename so concurrent runs can't observe a half-written index."""
    import hashlib
    import os
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "documents.parquet")
    files = [src]
    if os.path.isdir(src):
        files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(src)
            for f in fs
            if not f.startswith((".", "_"))
        )
    h = hashlib.sha256(b"textidx-format-v2\n")
    for p in files:
        st = os.stat(p)
        h.update(f"{os.path.relpath(p, sf_dir)}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    path = os.path.join(tempfile.gettempdir(), f"text_index_{h.hexdigest()[:16]}")
    if not os.path.isdir(path):
        tmp = tempfile.mkdtemp(prefix="text_index_build_")
        _tx.write_text_index(_t(spark, sf_dir, "documents"), tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race: reuse winner
    return path


@_entry(
    "bm25_search_indexed",
    "Index-backed BM25: same scores as bm25_search (shared oracle) but "
    "the corpus is NEVER rescanned — postings live partitionBy("
    "term_bucket = hex60(term) %% 64), so the literal term/bucket "
    "predicates prune the scan to the query terms' directories "
    "(~|terms|/64 of the index bytes at any corpus size).  df derives "
    "from the pruned postings themselves, keeping the index "
    "append-mergeable.",
    _duck_bm25_sql(),
)
def _q_bm25_indexed(spark, sf_dir):
    path = _text_index_path(spark, sf_dir)
    return _tx.bm25_from_index(spark, path, list(_BM25_TERMS))


@_entry(
    "events_debounce",
    "At-least-once delivery cleanup: suppress an event when the previous "
    "event of the same (user, type) lies within 1 h — one key shuffle, "
    "one lag window, integer microsecond comparison.",
    """WITH e AS (
  SELECT event_id, user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us, value,
         LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_us
  FROM events
)
SELECT event_id, user_id, event_type, us, value
FROM e WHERE prev_us IS NULL OR us - prev_us > 3600000000""",
)
def _q_debounce(spark, sf_dir):
    return analytics.events_debounce(load_events(spark, sf_dir))


@_entry(
    "events_linear_attribution",
    "Multi-touch linear attribution: each purchase splits a unit of "
    "credit + its revenue equally across the user's click/view touches "
    "in a 7-day lookback.  User-keyed equi-join with row-local time "
    "filter (bounded per-user fan-out, not a range join); decimal credit "
    "sums with the per-conversion rounding residual assigned to the "
    "first touch (exact reconciliation); no-touch conversions land in "
    "an 'unattributed' bucket so credit totals equal the conversion "
    "count exactly.",
    f"""WITH t AS (
  SELECT user_id, event_type AS touch_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
         event_id AS touch_id
  FROM events WHERE event_type IN ('click', 'view')
),
c AS (
  SELECT user_id, event_id AS conv_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS cus, value
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT conv_id, value, touch_type, tus, touch_id
  FROM c JOIN t USING (user_id)
  WHERE tus < cus AND cus - tus <= CAST(604800 AS BIGINT) * 1000000
),
per_conv AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_touches FROM pairs GROUP BY 1
),
shares AS (
  SELECT touch_type,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY tus, touch_id) AS rn,
         n_touches,
         {_dec6("CAST(1.0 AS DOUBLE) / n_touches")} AS base_credit,
         {_dec6("value / n_touches")} AS base_rev,
         CAST(value AS DECIMAL(25,6)) AS vdec
  FROM pairs JOIN per_conv USING (conv_id)
),
credited AS (
  SELECT touch_type,
         CAST(SUM(base_credit + CASE WHEN rn = 1
                  THEN CAST(1.0 AS DECIMAL(25,6)) - base_credit * n_touches
                  ELSE CAST(0.0 AS DECIMAL(25,6)) END) AS DOUBLE)
           AS attributed_conversions,
         CAST(SUM(base_rev + CASE WHEN rn = 1
                  THEN vdec - base_rev * n_touches
                  ELSE CAST(0.0 AS DECIMAL(25,6)) END) AS DOUBLE)
           AS attributed_revenue
  FROM shares GROUP BY touch_type
),
unatt AS (
  SELECT 'unattributed' AS touch_type,
         CAST(COUNT(*) AS DOUBLE) AS attributed_conversions,
         COALESCE(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 0.0)
           AS attributed_revenue
  FROM c WHERE conv_id NOT IN (SELECT conv_id FROM per_conv)
)
SELECT * FROM credited UNION ALL SELECT * FROM unatt""",
)
def _q_linear_attribution(spark, sf_dir):
    return analytics.events_linear_attribution(load_events(spark, sf_dir))


# -- Bloom-filter dedup prefilter (operators/sketches.py) --------------------

def _duck_bloom_sql() -> str:
    norm = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
    h = f"({_duck_hex60('ch')} % 2147483647)"
    pos = ", ".join(
        f"(({2 * r + 1} * h + {1000 * r + 7}) % 2147483647) % 8192"
        for r in range(4)
    )
    return f"""WITH seen AS (
  SELECT DISTINCT {norm} AS ch FROM documents WHERE doc_id % 7 = 0
),
sh AS (SELECT {h} AS h FROM (SELECT ch FROM seen)),
bloom AS (SELECT DISTINCT unnest([{pos}]) AS pos FROM sh),
batch AS (SELECT doc_id, {norm} AS ch FROM documents),
bh AS (SELECT doc_id, ch, {h} AS h FROM batch),
probes AS (SELECT doc_id, ch, unnest([{pos}]) AS pos FROM bh),
flags AS (
  SELECT doc_id, ch,
         CAST(COUNT(CASE WHEN bloom.pos IS NOT NULL THEN 1 END) AS BIGINT) = 4
           AS maybe_seen
  FROM probes LEFT JOIN bloom USING (pos) GROUP BY doc_id, ch
)
SELECT doc_id, maybe_seen, ch IN (SELECT ch FROM seen) AS actually_seen
FROM flags"""


@_entry(
    "bloom_dedup_prefilter",
    "Bloom-filter dedup PREFILTER: the seen corpus's normalized content "
    "hashes become a set-bit-positions frame (<= 8192 rows, broadcastable "
    "kilobytes); each batch doc probes its 4 affine positions row-locally "
    "against the broadcast — provably-unseen docs skip the exact "
    "anti-join entirely.  No false negatives (actually_seen => "
    "maybe_seen, pinned by pytest); false positives only cost a "
    "redundant exact check.",
    _duck_bloom_sql(),
)
def _q_bloom_prefilter(spark, sf_dir):
    norm = "md5(regexp_replace(lower(trim(text)), '\\\\s+', ' ')) AS ch"
    docs = _t(spark, sf_dir, "documents")
    seen = docs.filter("doc_id % 7 = 0").selectExpr(norm).distinct()
    batch = docs.selectExpr("doc_id", norm)
    bloom = _sk.bloom_positions(seen, "ch")
    flagged = _sk.bloom_maybe_contains(batch, bloom, "ch")
    return flagged.join(
        seen.selectExpr("ch", "true AS _s"), "ch", "left"
    ).selectExpr(
        "doc_id", "maybe_seen", "coalesce(_s, false) AS actually_seen"
    )


_DUCK_PIVOT = """SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(25,6)) END), 0) AS DOUBLE) AS click_value,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(25,6)) END), 0) AS DOUBLE) AS view_value,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(25,6)) END), 0) AS DOUBLE) AS signup_value,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(25,6)) END), 0) AS DOUBLE) AS purchase_value,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(25,6)) END), 0) AS DOUBLE) AS error_value
FROM events GROUP BY 1"""


@_entry(
    "events_daily_pivot",
    "Day x type pivot with an EXPLICIT value list — no distinct-collect "
    "driver pass, schema independent of the data (a new event type can't "
    "silently reshape downstream tables).  One shuffle; absent cells 0.",
    _DUCK_PIVOT,
)
def _q_daily_pivot(spark, sf_dir):
    return analytics.events_daily_pivot(load_events(spark, sf_dir))


@_entry(
    "events_unpivot_daily_values",
    "Inverse melt of the VALUE-sum pivot (built-in unpivot/stack, "
    "row-local, no shuffle): total on the day x type grid, so "
    "unpivot(pivot(x)) round-trips including zero-filled cells.",
    f"""WITH p AS ({_DUCK_PIVOT})
SELECT day, replace(name, '_value', '') AS event_type, value AS total_value
FROM (
  SELECT day, unnest(['click_value', 'view_value', 'signup_value',
                      'purchase_value', 'error_value']) AS name,
         unnest([click_value, view_value, signup_value, purchase_value,
                 error_value]) AS value
  FROM p
)""",
)
def _q_unpivot_daily_values(spark, sf_dir):
    return analytics.events_unpivot_daily_values(
        analytics.events_daily_pivot(load_events(spark, sf_dir))
    )


# -- hybrid retrieval: RRF(BM25, quality prior) ------------------------------

def _duck_rrf_sql(k: int = 60, n_list: int = 100, top_n: int = 20) -> str:
    return f"""WITH bm AS ({_duck_bm25_sql(top_n=n_list)}),
bmr AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY bm25_score DESC, doc_id) AS INTEGER) AS r0
  FROM bm
),
q AS (
  SELECT doc_id,
         CAST(len(list_distinct({_DUCK_TOKS})) AS DOUBLE)
           / len({_DUCK_TOKS}) AS ttr
  FROM documents
),
qr AS (
  SELECT doc_id, CAST(rn AS INTEGER) AS r1 FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY ttr DESC, doc_id) AS rn FROM q
  ) WHERE rn <= {n_list}
),
fused AS (
  SELECT COALESCE(bmr.doc_id, qr.doc_id) AS doc_id,
         COALESCE(CAST(1.0 AS DOUBLE) / ({k} + r0), CAST(0.0 AS DOUBLE))
           + COALESCE(CAST(1.0 AS DOUBLE) / ({k} + r1), CAST(0.0 AS DOUBLE)) AS rrf_score,
         r0 AS rank_0, r1 AS rank_1
  FROM bmr FULL OUTER JOIN qr ON bmr.doc_id = qr.doc_id
)
SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {top_n}"""


@_entry(
    "hybrid_search_rrf",
    "Hybrid retrieval: reciprocal-rank fusion of the BM25 top-100 with a "
    "lexical-diversity quality prior top-100 — only ORDER survives into "
    "the fusion, so incomparable score scales compose and every term is "
    "a reciprocal of a small integer summed in fixed order "
    "(bit-reproducible).  Component lists are top-N bounded (distributed "
    "TakeOrdered), so the fusion joins 100-row frames.",
    _duck_rrf_sql(),
)
def _q_hybrid_rrf(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    n_list = 100
    bm = _tx.bm25_rank(docs, list(_BM25_TERMS), top_n=n_list)
    bmr = bm.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("bm25_score").desc(), "doc_id"))
        .cast("int"),
    ).select("doc_id", "rank")
    q = _tx.quality_scores(docs).select("doc_id", "ttr")
    qtop = q.orderBy(F.col("ttr").desc(), "doc_id").limit(n_list)
    qr = qtop.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("ttr").desc(), "doc_id"))
        .cast("int"),
    ).select("doc_id", "rank")
    return _tx.rrf_fuse([bmr, qr])


@_entry(
    "contrastive_negative_samples",
    "Deterministic negative sampling for contrastive training: k=4 "
    "pseudo-random candidates per anchor via hex60(anchor|salt|j) mod n, "
    "filtered to true negatives (different label and id).  Row-local "
    "candidate generation + ONE equi-join for candidate labels; same "
    "negatives on any engine/partitioning — epoch-reproducible.",
    f"""WITH n AS (SELECT COUNT(*) AS n FROM embeddings),
cands AS (
  SELECT vec_id, label AS anchor_label, j,
         {_duck_hex60("CAST(vec_id AS VARCHAR) || '|neg|' || CAST(j AS VARCHAR)")} % n AS neg_vec_id
  FROM embeddings, n, (SELECT unnest([1, 2, 3, 4]) AS j)
)
SELECT c.vec_id, c.j, c.anchor_label, c.neg_vec_id, e.label AS neg_label
FROM cands c JOIN embeddings e ON c.neg_vec_id = e.vec_id
WHERE c.neg_vec_id <> c.vec_id AND e.label <> c.anchor_label""",
)
def _q_negative_samples(spark, sf_dir):
    return _sim.negative_samples(_t(spark, sf_dir, "embeddings"))


@_entry(
    "events_aqp_daily_totals",
    "Approximate query processing: per-day totals from a deterministic "
    "10%% hash-bucket sample with Horvitz-Thompson scale-up and a 95%% "
    "CI — exact decimal sample sums, one correctly-rounded sqrt, so "
    "even the interval is bit-stable; the sample predicate pushes down "
    "to the scan.",
    f"""WITH s AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(value AS DECIMAL(25,6)) AS v,
         CAST(value * value AS DECIMAL(25,6)) AS v2
  FROM events
  WHERE {_duck_hex60("CAST(event_id AS VARCHAR)")} % 100 < 10
),
agg AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_sampled,
         SUM(v) AS sv, SUM(v2) AS sv2
  FROM s GROUP BY 1
),
est AS (
  SELECT day, n_sampled,
         CAST(sv AS DOUBLE) * CAST(10.0 AS DOUBLE) AS est_total,
         CAST(10.0 AS DOUBLE) * (CAST(10.0 AS DOUBLE) - CAST(1.0 AS DOUBLE))
           * CAST(sv2 AS DOUBLE) AS est_var
  FROM agg
)
SELECT day, n_sampled, est_total,
       est_total - CAST(1.96 AS DOUBLE) * sqrt(est_var) AS ci_low,
       est_total + CAST(1.96 AS DOUBLE) * sqrt(est_var) AS ci_high
FROM est""",
)
def _q_aqp_daily(spark, sf_dir):
    return analytics.events_aqp_daily_totals(load_events(spark, sf_dir))


@_entry(
    "events_k_anonymity",
    "k-anonymity audit (k=5) over the quasi-identifier tuple (event_type,"
    " day, floor(value/10)): histogram of equivalence-class sizes with "
    "violation flags — the privacy release gate quasi-ids need and "
    "direct-identifier scrubbing can't give.  One quasi-id groupBy + a "
    "tiny histogram aggregate.",
    """WITH classes AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(floor(value / 10) AS BIGINT) AS vb,
         CAST(COUNT(*) AS BIGINT) AS class_size
  FROM events GROUP BY 1, 2, 3
)
SELECT class_size, CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(class_size * COUNT(*) AS BIGINT) AS n_records,
       class_size < 5 AS violates_k
FROM classes GROUP BY class_size""",
)
def _q_k_anonymity(spark, sf_dir):
    from admira_etl_project_prueba_spark.operators.profile import k_anonymity_audit

    ev = load_events(spark, sf_dir).select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.expr("CAST(floor(value / 10) AS BIGINT)").alias("vb"),
    )
    return k_anonymity_audit(ev, ["event_type", "day", "vb"], k=5)


def _duck_acf_sql(max_lag: int = 7) -> str:
    lags = ", ".join(str(k) for k in range(1, max_lag + 1))
    nums = ", ".join(
        f"CAST(CAST(floor(((x - mean) * (x_{k} - mean)) * 1000000.0 + 0.5) AS BIGINT) * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(25,6))"
        for k in range(1, max_lag + 1)
    )
    lag_cols = ", ".join(
        f"LAG(x, {k}) OVER w AS x_{k}" for k in range(1, max_lag + 1)
    )
    return f"""WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, x, {lag_cols}
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
stats AS (
  SELECT event_type,
         CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS mean,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY 1
),
centered AS (SELECT * FROM lagged JOIN stats USING (event_type)),
stacked AS (
  SELECT event_type, n_days,
         CAST(CAST(floor(((x - mean) * (x - mean)) * 1000000.0 + 0.5) AS BIGINT) * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(25,6)) AS den_term,
         unnest([{lags}]) AS lag,
         unnest([{nums}]) AS num_term
  FROM centered
)
SELECT event_type, CAST(lag AS INTEGER) AS lag, MAX(n_days) AS n_days,
       CASE WHEN SUM(den_term) <> 0 THEN
         round(CAST(SUM(num_term) AS DOUBLE) / CAST(SUM(den_term) AS DOUBLE), 6)
       END AS acf
FROM stacked GROUP BY event_type, lag"""


@_entry(
    "events_daily_autocorr",
    "Lag-1..7 autocorrelation of each type's daily totals (seasonality "
    "detector): ONE type-window shuffle computes all lags; decimal-cast "
    "cross products (order-independent sums); 6-decimal-rounded ratio — "
    "same cross-engine float policy as the OLS trend fit.",
    _duck_acf_sql(),
)
def _q_daily_autocorr(spark, sf_dir):
    return analytics.events_daily_autocorr(load_events(spark, sf_dir))


@_entry(
    "events_session_window_native",
    "Sessionization via Spark's NATIVE session_window aggregation (the "
    "same dataflow Structured Streaming uses for session state): one "
    "shuffle, merge-on-overlap.  Boundary semantics differ from the "
    "window-flag formulation by one edge: a gap of EXACTLY the timeout "
    "starts a new session here (window merge needs next < prev + gap), "
    "so the oracle flags is_new on >= — both formulations are exact, "
    "the catalog carries both.",
    f"""WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
                   OR epoch_us(CAST(ts AS TIMESTAMP)) - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM flagged
)
SELECT user_id,
       epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS session_start_us,
       epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS session_end_us,
       COUNT(*) AS n_events,
       {_DSUM.format(x='value')} AS total_value
FROM sess GROUP BY user_id, sid""",
)
def _q_session_window_native(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            "user_id",
            F.session_window(F.col("ts").cast("timestamp"), "30 minutes"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            (F.unix_micros(F.col("session_window.end")) - F.lit(1_800_000_000)).alias(
                "session_end_us"
            ),
            "n_events",
            "total_value",
        )
    )


@_entry(
    "events_winsorize",
    "Winsorize values to the per-type [p1, p99] band (exact percentiles, "
    "broadcast bounds, clamp + audit flag) — the robust preprocessing "
    "step that tames heavy tails before means/regressions.",
    """WITH b AS (
  SELECT event_type, quantile_cont(value, 0.01) AS p_lo,
         quantile_cont(value, 0.99) AS p_hi
  FROM events GROUP BY 1
)
SELECT event_id, event_type, value,
       CASE WHEN value < p_lo THEN p_lo WHEN value > p_hi THEN p_hi
            ELSE value END AS value_winsorized,
       value < p_lo OR value > p_hi AS was_clipped
FROM events JOIN b USING (event_type)""",
)
def _q_winsorize(spark, sf_dir):
    return analytics.events_winsorize(load_events(spark, sf_dir))


@_entry(
    "events_value_histogram_minmax",
    "DATA-DRIVEN equi-width 20-bin histogram per type (per-type min/max "
    "broadcast back, integer floor binning, max folds into the last "
    "bin) — complements the fixed-bin events_value_histogram, whose "
    "edges stay comparable across snapshots.",
    """WITH rng AS (
  SELECT event_type, MIN(value) AS v_min, MAX(value) AS v_max
  FROM events GROUP BY 1
),
binned AS (
  SELECT e.event_type, v_min, v_max,
         CAST(LEAST(CAST(floor((value - v_min) / (CASE WHEN v_max > v_min
              THEN (v_max - v_min) ELSE 1.0 END) * 20) AS INTEGER), 19) AS INTEGER) AS bin
  FROM events e JOIN rng USING (event_type)
)
SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(v_min) + (MAX(v_max) - MAX(v_min)) * bin / 20 AS bin_lo,
       MAX(v_min) + (MAX(v_max) - MAX(v_min)) * (bin + 1) / 20 AS bin_hi
FROM binned GROUP BY event_type, bin""",
)
def _q_value_histogram_minmax(spark, sf_dir):
    return analytics.events_value_histogram_minmax(load_events(spark, sf_dir))


@_entry(
    "containment_pairs",
    "ASYMMETRIC near-dup (quote / partial-copy detection): directed "
    "pairs with |sh(src) ∩ sh(dst)| / |sh(src)| >= 0.5 on the "
    "df-capped shingle sets — inverted-index self-join whose fan-out is "
    "bounded by max_df x postings (boilerplate shingles above df=100 "
    "are dropped from BOTH the intersection and the denominator).",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sg AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM tok),
shs AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg),
postings AS (SELECT doc_id, unnest(sh) AS h FROM shs),
rare AS (SELECT h FROM postings GROUP BY h HAVING COUNT(*) <= 100),
pruned AS (SELECT doc_id, h FROM postings JOIN rare USING (h)),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_src FROM pruned GROUP BY 1),
pairs AS (
  SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM pruned a JOIN pruned b ON a.h = b.h AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT src_doc, dst_doc, n_common, n_src,
       CAST(n_common AS DOUBLE) / CAST(n_src AS DOUBLE) AS containment
FROM pairs JOIN sizes ON pairs.src_doc = sizes.doc_id
WHERE CAST(n_common AS DOUBLE) / CAST(n_src AS DOUBLE) >= 0.5""",
)
def _q_containment(spark, sf_dir):
    return _tx.containment_pairs(_t(spark, sf_dir, "documents"))


# -- LM quality scoring & corpus drift (textops.lm_*, source_*) -------------

@_entry(
    "lm_cross_entropy_scores",
    "CCNet-style LM quality filter: per-doc cross-entropy (nats/token) "
    "under an add-one-smoothed hashed-unigram LM of the reference slice "
    "(lang='en') — per-BUCKET ln rounded to the decimal grid (DSIR "
    "convention) keeps the surface hash-oracle-able; the dense 8192-row "
    "model broadcasts, text never shuffles.",
    f"""WITH tok AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest({_DUCK_TOKS}) AS t FROM documents
  ) WHERE t IS NOT NULL AND t != ''
),
feats AS (
  SELECT doc_id, {_duck_hex60("t")} % 8192 AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY doc_id, b
),
ref AS (
  SELECT b, SUM(c) AS r_cnt
  FROM feats JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b
),
tots AS (SELECT (SELECT SUM(c) FROM feats JOIN documents USING (doc_id)
                 WHERE lang = 'en') AS r_tot),
dist AS (
  SELECT b.b,
         CAST(round(ln((COALESCE(r_cnt, 0) + 1) / CAST(r_tot + 8192 AS DOUBLE)), 6)
              AS DECIMAL(25,6)) AS logp
  FROM (SELECT unnest(range(8192)) AS b) b LEFT JOIN ref ON b.b = ref.b, tots
),
w AS (
  SELECT doc_id, SUM(c * logp) AS w, CAST(SUM(c) AS BIGINT) AS n_tokens
  FROM feats JOIN dist USING (b) GROUP BY doc_id
)
SELECT d.doc_id, CAST(-w.w AS DOUBLE) / CAST(w.n_tokens AS DOUBLE) AS cross_entropy,
       COALESCE(w.n_tokens, 0) AS n_tokens
FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id""",
)
def _q_lm_cross_entropy(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return _tx.lm_cross_entropy(docs, docs.filter("lang = 'en'"))


@_entry(
    "source_token_kl",
    "Per-source distribution drift: count-weighted KL(source ‖ corpus) "
    "over 4096 hashed-unigram buckets, add-one smoothed — the standing "
    "'which feed stopped looking like the corpus' monitor.  Both ln "
    "terms computed on the post-agg (source × bucket) frame and "
    "grid-rounded before the exact integer×decimal sum; one map-side-"
    "reduced corpus shuffle.",
    f"""WITH tok AS (
  SELECT source, t FROM (
    SELECT COALESCE(source, '{_tx.UNKNOWN_SOURCE}') AS source,
           unnest({_DUCK_TOKS}) AS t FROM documents
  ) WHERE t IS NOT NULL AND t != ''
),
per AS (
  SELECT source, {_duck_hex60("t")} % 4096 AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY source, b
),
stot AS (SELECT source, SUM(c) AS s_tot FROM per GROUP BY source),
gl AS (SELECT b, SUM(c) AS g_cnt FROM per GROUP BY b),
gtot AS (SELECT SUM(g_cnt) AS g_tot FROM gl),
terms AS (
  SELECT per.source, per.c, stot.s_tot,
         CAST(round(ln((per.c + 1) / CAST(stot.s_tot + 4096 AS DOUBLE))
               - ln((gl.g_cnt + 1) / CAST(gtot.g_tot + 4096 AS DOUBLE)), 6)
              AS DECIMAL(25,6)) AS lr
  FROM per JOIN stot USING (source) JOIN gl USING (b), gtot
)
SELECT source,
       CAST(SUM(c * lr) AS DOUBLE) / CAST(MAX(s_tot) AS DOUBLE) AS kl_nats,
       CAST(MAX(s_tot) AS BIGINT) AS n_tokens
FROM terms GROUP BY source""",
)
def _q_source_kl(spark, sf_dir):
    return _tx.source_token_kl(_t(spark, sf_dir, "documents"))


@_entry(
    "source_overlap_matrix",
    "Cross-source shared-content contamination matrix: duplicate doc "
    "PAIRS per source pair (a <= b) sharing a content fingerprint — "
    "diagonal = C(n,2) within-feed self-duplication, off-diagonal = "
    "feed-to-feed recrawl.  Grouped row-local pair expansion after ONE "
    "hash shuffle (the self-join shape would shuffle twice); exact "
    "integer arithmetic; zero pairs omitted.  This entry exercises the "
    "30-char normalized-PREFIX fingerprint (shared-boilerplate "
    "detection — the synthetic corpus has no byte-exact duplicates, "
    "which would make the default key vacuous here); the exact-hash "
    "default is pinned by planted-duplicate pytest.",
    f"""WITH h AS (
  SELECT md5(substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 30)) AS ch,
         COALESCE(source, '{_tx.UNKNOWN_SOURCE}') AS source
  FROM documents
),
c AS (SELECT ch, source, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY ch, source)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(SUM(CASE WHEN a.source = b.source THEN (a.c * (a.c - 1)) // 2
                ELSE a.c * b.c END) AS BIGINT) AS dup_pairs
FROM c a JOIN c b ON a.ch = b.ch AND a.source <= b.source
GROUP BY 1, 2
HAVING SUM(CASE WHEN a.source = b.source THEN (a.c * (a.c - 1)) // 2
           ELSE a.c * b.c END) > 0""",
)
def _q_source_overlap(spark, sf_dir):
    return _tx.source_overlap_matrix(
        _t(spark, sf_dir, "documents"),
        key_sql="md5(substring(regexp_replace(lower(trim(text)), "
        "'\\\\s+', ' '), 1, 30))",
    )


@_entry(
    "lsh_recall_report",
    "Approximation self-evaluation: recall + candidate precision of the "
    "banded MinHash-LSH pipeline against the EXACT prefix-filtered "
    "Jaccard join on the same shingle sets — candidates verifying >= "
    "threshold are a subset of the truth by construction, so the ratio "
    "IS recall.  Both sides are the production operators; the combine "
    "is a 1-row scalar join.",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sg AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM tok),
shs AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg),
tp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
         len(a.sh) AS la, len(b.sh) AS lb
  FROM shs a JOIN shs b ON a.doc_id < b.doc_id
  WHERE len(a.sh) + len(b.sh) > 0
),
truth AS (
  SELECT doc_a FROM tp WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.5
),
sig AS (
        SELECT doc_id, unnest({'[' + ', '.join(str(p) for p in range(16)) + ']'}) AS perm,
               unnest([{", ".join(f"coalesce(list_min(list_transform(sh, h -> ({2*p+1} * h + {1000*p+7}) % 2147483647)), 2147483647)" for p in range(16))}]) AS minhash
        FROM shs),
bands AS (
  SELECT doc_id, perm // 2 AS band,
         MIN(minhash) AS lo, MAX(minhash) AS hi, SUM(minhash) AS s
  FROM sig GROUP BY doc_id, perm // 2
),
bkt AS (SELECT doc_id, concat_ws('_', band, lo, hi, s) AS bucket FROM bands),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bkt a JOIN bkt b USING (bucket)
  WHERE a.doc_id < b.doc_id
),
ver AS (
  SELECT CAST(len(list_filter(sa.sh, x -> list_contains(sb.sh, x))) AS DOUBLE) /
         (len(sa.sh) + len(sb.sh) - len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))) AS jaccard
  FROM cand
  JOIN shs sa ON sa.doc_id = cand.doc_a
  JOIN shs sb ON sb.doc_id = cand.doc_b
  WHERE len(sa.sh) + len(sb.sh) > 0
)
SELECT t.n_true_pairs, v.n_candidates, v.n_captured,
       CASE WHEN t.n_true_pairs > 0
            THEN CAST(v.n_captured AS DOUBLE) / t.n_true_pairs END AS recall,
       CASE WHEN v.n_candidates > 0
            THEN CAST(v.n_captured AS DOUBLE) / v.n_candidates END AS candidate_precision
FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs FROM truth) t,
     (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(COALESCE(SUM(CASE WHEN jaccard >= 0.5 THEN 1 END), 0) AS BIGINT)
               AS n_captured
      FROM ver) v""",
)
def _q_lsh_recall(spark, sf_dir):
    return _tx.lsh_recall_report(_t(spark, sf_dir, "documents"))


@_entry(
    "phrase_search",
    "Exact consecutive-phrase search ('slow hash batch') via the anchor "
    "trick: each posting matching phrase term i votes (doc, pos - i); "
    "an anchor with all k distinct i's is one occurrence — one groupBy, "
    "no k-way self-join, overlap-correct.  Postings are filtered to the "
    "phrase's terms BEFORE any shuffle (df-bounded, never corpus "
    "tokens); indexed variant reads only the terms' bucket dirs "
    "(parity-pinned in pytest).",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
pos AS (
  SELECT doc_id, unnest(t) AS token, unnest(range(len(t))) AS pos FROM tok
),
ph AS (SELECT * FROM (VALUES (0, 'slow'), (1, 'hash'), (2, 'batch')) AS v(idx, term)),
m AS (
  SELECT doc_id, pos - idx AS anchor, idx
  FROM pos JOIN ph ON token = term
),
hits AS (
  SELECT doc_id, anchor FROM m
  GROUP BY doc_id, anchor HAVING COUNT(DISTINCT idx) = 3
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM hits GROUP BY doc_id""",
)
def _q_phrase_search(spark, sf_dir):
    return _tx.phrase_search(
        _t(spark, sf_dir, "documents"), ["slow", "hash", "batch"]
    )


def _duck_lpa_sql(iters: int = 3) -> str:
    """Unrolled synchronous-LPA oracle over the co-supply graph — each
    round is a mode-with-min-tiebreak window, exactly the struct-max the
    Spark operator computes."""
    rounds, prev = "", "r0"
    for i in range(1, iters + 1):
        rounds += f""",
nb{i} AS (SELECT e.a AS node, l.label FROM sym e JOIN {prev} l ON e.b = l.node),
cnt{i} AS (SELECT node, label, COUNT(*) AS c FROM nb{i} GROUP BY node, label),
r{i} AS (SELECT node, label FROM (
  SELECT node, label,
         ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
  FROM cnt{i}) WHERE rn = 1)"""
        prev = f"r{i}"
    return f"""WITH co AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_SHARED}
),
sym AS (SELECT u AS a, v AS b FROM co UNION SELECT v AS a, u AS b FROM co),
r0 AS (SELECT DISTINCT a AS node, a AS label FROM sym){rounds}
SELECT node, CAST(label AS BIGINT) AS label FROM {prev}"""


@_entry(
    "cosupply_communities",
    "Deterministic synchronous label-propagation communities over the "
    "min-support co-supply graph: 3 fixed rounds, most-frequent neighbor "
    "label with min-label tie-break — per round ONE map-side-reduced "
    "(node, label, count) shuffle and a struct-max election (no window "
    "sort); loop invariants localCheckpointed like pagerank.",
    _duck_lpa_sql(),
)
def _q_lpa(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_suppkey")).alias("s"))
        .selectExpr(
            "explode(flatten(transform(s, (x, i) -> "
            "transform(slice(s, i + 2, size(s)), y -> struct(x AS u, y AS v))"
            "))) AS p"
        )
        .selectExpr("p.u", "p.v")
        .filter("u < v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _TRI_MIN_SHARED)
        .select("u", "v")
    )
    return _graph.label_propagation(edges)


def _duck_profile_long(name: str, where: str) -> str:
    """Long-form one-pass profile CTE pair over documents (drift oracle
    helper) — mirrors profile.profile_columns exactly."""
    cols = ["doc_id", "text", "lang", "source"]
    aggs = ", ".join(
        f"COUNT({c}) AS nn_{c}, COUNT(DISTINCT {c}) AS nd_{c}, "
        f"MIN(CAST({c} AS VARCHAR)) AS mn_{c}, MAX(CAST({c} AS VARCHAR)) AS mx_{c}"
        for c in cols
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column, n_rows, nn_{c} AS n_nonnull, nd_{c} AS n_distinct, "
        f"mn_{c} AS min_str, mx_{c} AS max_str FROM {name}_w"
        for c in cols
    )
    return (
        f"{name}_w AS (SELECT COUNT(*) AS n_rows, {aggs} FROM documents {where}),\n"
        f"{name} AS (\n{arms}\n)"
    )


@_entry(
    "profile_drift",
    "Snapshot data-contract audit: per-column join of two one-pass "
    "profiles (old = even doc_ids, new = full corpus) with null-rate / "
    "distinct-ratio deltas, null-safe string-range movement, and a "
    "drifted flag — the accept/reject check an ingest pipeline runs "
    "before taking a snapshot.  Each side is ONE scan + ONE aggregate; "
    "the join is |columns| rows.",
    f"""WITH {_duck_profile_long("po", "WHERE doc_id % 2 = 0")},
{_duck_profile_long("pn", "")}
SELECT po."column" AS "column",
       po.n_rows AS n_rows_old, pn.n_rows AS n_rows_new,
       CASE WHEN po.n_rows > 0 THEN 1.0 - CAST(po.n_nonnull AS DOUBLE) / po.n_rows END AS null_rate_old,
       CASE WHEN pn.n_rows > 0 THEN 1.0 - CAST(pn.n_nonnull AS DOUBLE) / pn.n_rows END AS null_rate_new,
       (CASE WHEN pn.n_rows > 0 THEN 1.0 - CAST(pn.n_nonnull AS DOUBLE) / pn.n_rows END)
       - (CASE WHEN po.n_rows > 0 THEN 1.0 - CAST(po.n_nonnull AS DOUBLE) / po.n_rows END) AS null_rate_delta,
       CASE WHEN po.n_rows > 0 THEN CAST(po.n_distinct AS DOUBLE) / po.n_rows END AS distinct_ratio_old,
       CASE WHEN pn.n_rows > 0 THEN CAST(pn.n_distinct AS DOUBLE) / pn.n_rows END AS distinct_ratio_new,
       (CASE WHEN pn.n_rows > 0 THEN CAST(pn.n_distinct AS DOUBLE) / pn.n_rows END)
       - (CASE WHEN po.n_rows > 0 THEN CAST(po.n_distinct AS DOUBLE) / po.n_rows END) AS distinct_ratio_delta,
       po.min_str IS DISTINCT FROM pn.min_str OR po.max_str IS DISTINCT FROM pn.max_str AS range_moved,
       abs((CASE WHEN pn.n_rows > 0 THEN 1.0 - CAST(pn.n_nonnull AS DOUBLE) / pn.n_rows END)
           - (CASE WHEN po.n_rows > 0 THEN 1.0 - CAST(po.n_nonnull AS DOUBLE) / po.n_rows END)) > 0.05
       OR abs((CASE WHEN pn.n_rows > 0 THEN CAST(pn.n_distinct AS DOUBLE) / pn.n_rows END)
              - (CASE WHEN po.n_rows > 0 THEN CAST(po.n_distinct AS DOUBLE) / po.n_rows END)) > 0.1
       OR po.min_str IS DISTINCT FROM pn.min_str
       OR po.max_str IS DISTINCT FROM pn.max_str AS drifted
FROM po JOIN pn ON po."column" = pn."column"
""",
)
def _q_profile_drift(spark, sf_dir):
    from admira_etl_project_prueba_spark.operators.profile import profile_drift

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    return profile_drift(docs.filter("doc_id % 2 = 0"), docs)


# -- round-5 curation additions ---------------------------------------------

@_entry(
    "dup_cluster_profile",
    "Duplication histogram: for every exact-dup cluster size, the number "
    "of clusters, documents, and corpus fraction.  Hash-only shuffles; "
    "the histogram frame is tiny (distinct cluster sizes), corpus total "
    "joins as a 1-row broadcast scalar.",
    """WITH c AS (SELECT md5(text) AS h, COUNT(*) AS n_copies FROM documents GROUP BY 1),
hist AS (SELECT n_copies, COUNT(*) AS n_clusters FROM c GROUP BY 1),
t AS (SELECT COUNT(*) AS total FROM documents)
SELECT n_copies, n_clusters, n_copies * n_clusters AS n_docs,
       CAST(n_copies * n_clusters AS DOUBLE) / total AS pct_docs
FROM hist, t""",
)
def _q_dup_profile(spark, sf_dir):
    return _tx.dup_cluster_profile(_t(spark, sf_dir, "documents"))


@_entry(
    "quality_calibrated",
    "Source-relative quality calibration: type-token ratio re-expressed "
    "as a per-source percentile (percent_rank) plus a global percentile, "
    "so one keep-threshold means the same thing across feeds.  Windows "
    "shuffle (score, doc_id) pairs only, never text.",
    f"""WITH tok AS (SELECT doc_id, coalesce(source, '{_tx.UNKNOWN_SOURCE}') AS source,
                     {_DUCK_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, source,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS quality_raw
      FROM tok)
SELECT doc_id, source, quality_raw,
       percent_rank() OVER (PARTITION BY source ORDER BY quality_raw, doc_id) AS q_pct_source,
       percent_rank() OVER (ORDER BY quality_raw, doc_id) AS q_pct_global
FROM s""",
)
def _q_quality_calibrated(spark, sf_dir):
    return _tx.quality_calibrated(_t(spark, sf_dir, "documents"), exact=True)


@_entry(
    "quality_calibrated_sampled",
    "Scale-safe quality calibration: the global percent_rank (a "
    "single-partition sort) becomes a 99-edge approx_percentile grid "
    "cdf estimate; the per-source window stays (partitioned).  Since "
    "round 8 the DEFAULT.  Hash-exact oracle: _gk_edges_cte grid (GK "
    "edges exact at gate SF) + the same grid-fraction arithmetic; "
    "centile tolerance vs the exact twin additionally pinned in pytest.",
    f"""WITH tok AS (SELECT doc_id, coalesce(source, '{_tx.UNKNOWN_SOURCE}') AS source,
                     {_DUCK_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, source,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS quality_raw
      FROM tok),
{_gk_edges_cte('s', 'quality_raw', _Q99, 'rk', 'ed')},
g AS (
  SELECT s.doc_id, COUNT(CASE WHEN s.quality_raw > e.v THEN 1 END) AS a
  FROM s CROSS JOIN ed e GROUP BY s.doc_id
)
SELECT s.doc_id, s.source, s.quality_raw,
       percent_rank() OVER (PARTITION BY source ORDER BY quality_raw, doc_id)
         AS q_pct_source,
       CAST(g.a AS DOUBLE) / 99.0 AS q_pct_global
FROM s JOIN g USING (doc_id)""",
)
def _q_quality_calibrated_sampled(spark, sf_dir):
    return _tx.quality_calibrated(_t(spark, sf_dir, "documents"), exact=False)


@_entry(
    "ngram_novelty_scores",
    "Per-document n-gram novelty: fraction of a doc's distinct 3-token "
    "shingles appearing in no other document (memorization-risk / "
    "boilerplate diagnostic).  Shuffles (hash, doc) then (doc, flag) "
    "pairs; shingle-less docs report NULL novelty, not a fake 1.0.",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
sg AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM tok),
shs AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg),
rws AS (SELECT doc_id, unnest(sh) AS h FROM shs),
df AS (SELECT h, COUNT(*) AS df FROM rws GROUP BY h),
per AS (SELECT rws.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        FROM rws JOIN df USING (h) GROUP BY rws.doc_id)
SELECT d.doc_id,
       coalesce(p.n_shingles, CAST(0 AS BIGINT)) AS n_shingles,
       coalesce(p.n_shared, CAST(0 AS BIGINT)) AS n_shared,
       CASE WHEN coalesce(p.n_shingles, 0) > 0 THEN
         1.0 - CAST(coalesce(p.n_shared, 0) AS DOUBLE) / p.n_shingles END AS novelty
FROM documents d LEFT JOIN per p USING (doc_id)""",
)
def _q_ngram_novelty(spark, sf_dir):
    return _tx.ngram_novelty_scores(_t(spark, sf_dir, "documents"))


_FORGET_IDS = [1, 2, 3]


@_entry(
    "forget_propagation",
    "Right-to-be-forgotten propagation: the listed doc ids plus every "
    "exact (normalized) duplicate of their content — a broadcast "
    "semi-join against the corpus hash projection, one scan, no text "
    "shuffle.",
    f"""WITH h AS (SELECT doc_id,
        md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ch
        FROM documents)
SELECT doc_id,
       CASE WHEN doc_id IN ({", ".join(str(i) for i in _FORGET_IDS)})
            THEN 'listed' ELSE 'duplicate_of_listed' END AS reason
FROM h
WHERE ch IN (SELECT ch FROM h
             WHERE doc_id IN ({", ".join(str(i) for i in _FORGET_IDS)}))""",
)
def _q_forget(spark, sf_dir):
    return _tx.forget_propagation(
        _t(spark, sf_dir, "documents"), _FORGET_IDS, normalized=True
    )


@_entry(
    "bpe_merge_candidates",
    "First-round BPE merge statistics: corpus-weighted adjacent "
    "character-pair frequencies inside tokens, top 50 — the quantity a "
    "tokenizer trainer maximizes.  Pair explosion runs over the "
    "VOCABULARY (distinct tokens), not the corpus.",
    f"""WITH tok AS (SELECT unnest({_DUCK_TOKS}) AS token FROM documents),
tc AS (SELECT token, COUNT(*) AS cnt FROM tok
       WHERE token IS NOT NULL AND token != '' GROUP BY token),
p AS (SELECT unnest(list_transform(range(1, length(token)),
                                   i -> substring(token, i, 2))) AS pair, cnt
      FROM tc WHERE length(token) >= 2)
SELECT pair, CAST(SUM(cnt) AS BIGINT) AS freq
FROM p GROUP BY pair ORDER BY freq DESC, pair LIMIT 50""",
)
def _q_bpe_merges(spark, sf_dir):
    return _tx.bpe_merge_candidates(_t(spark, sf_dir, "documents"), top_n=50)


@_entry(
    "bpe_learned_merges",
    "The full BPE tokenizer trainer (Sennrich 2016), 4 merge rounds as "
    "one lazy plan: weighted adjacent-pair argmax (ties lexicographic) "
    "then a row-local doubled-separator rewrite of the VOCABULARY "
    "sequences — one corpus shuffle total, per-round cost is "
    "vocabulary-bounded.",
    _duck_bpe_ctes(4)
    + ",\n"
    + ",\n".join(
        f"""m{r} AS (
  SELECT CAST({r} AS INT) AS rank, l AS left_sym, r AS right_sym,
         l || r AS merged, pair_count FROM b{r})"""
        for r in range(1, 5)
    )
    + "\nSELECT * FROM m1 UNION ALL SELECT * FROM m2 "
    "UNION ALL SELECT * FROM m3 UNION ALL SELECT * FROM m4",
)
def _q_bpe_learned_merges(spark, sf_dir):
    # frontier mode: identical merge list (pytest-pinned vs the unrolled
    # single-plan mode), but the vocabulary materializes once and the
    # rounds run through the bounded in-process fast path instead of
    # unrolling four aggregate subtrees into one nested plan
    return _tx.bpe_learn_merges(
        _t(spark, sf_dir, "documents"), n_merges=4, checkpoint_every=8
    )


@_entry(
    "bpe_learned_merges_deep",
    "The BPE trainer at real vocabulary depth (64 merge rounds) in "
    "FRONTIER-CHECKPOINT mode: each round's argmax is materialized and "
    "the vocabulary frame localCheckpoints every 8 rounds, so plan "
    "depth — and per-round cost — stays flat with round index instead "
    "of unrolling 64 rounds into one plan.  Output is identical to the "
    "unrolled mode (pytest-pinned).",
    _duck_bpe_ctes(64, materialized=True)
    + ",\n"
    + ",\n".join(
        f"""m{r} AS (
  SELECT CAST({r} AS INT) AS rank, l AS left_sym, r AS right_sym,
         l || r AS merged, pair_count FROM b{r})"""
        for r in range(1, 65)
    )
    + "\n"
    + " UNION ALL ".join(f"SELECT * FROM m{r}" for r in range(1, 65)),
)
def _q_bpe_learned_merges_deep(spark, sf_dir):
    return _tx.bpe_learn_merges(
        _t(spark, sf_dir, "documents"), n_merges=64, checkpoint_every=8
    )


@_entry(
    "bpe_encode_stats",
    "Per-document encoding cost under the learned BPE vocabulary: the "
    "trained sequences ARE the encoder (a word's token count = its "
    "final symbol count), joined vocabulary-vs-corpus — n_words, "
    "n_chars, n_bpe_tokens, chars_per_token per document.",
    _duck_bpe_ctes(4)
    + """,
vocab AS (
  SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS w_tokens,
         CAST(length(word) AS BIGINT) AS w_chars
  FROM v4),
dw AS (
  SELECT doc_id, unnest(t) AS word FROM tok)
SELECT doc_id, COUNT(*) AS n_words,
       CAST(SUM(w_chars) AS BIGINT) AS n_chars,
       CAST(SUM(w_tokens) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(w_chars) AS DOUBLE) / SUM(w_tokens) AS chars_per_token
FROM dw JOIN vocab USING (word)
WHERE word IS NOT NULL AND word != ''
GROUP BY doc_id""",
)
def _q_bpe_encode_stats(spark, sf_dir):
    return _tx.bpe_encode_stats(_t(spark, sf_dir, "documents"), n_merges=4)


def _bpe_artifact_path(spark, sf_dir, n_merges: int = 64) -> str:
    """Content-keyed cached BPE merge artifact for ``sf_dir``'s documents
    — trained ONCE per corpus content at depth ``n_merges`` (frontier-
    checkpoint mode), then served frozen: the write_bpe_merges →
    bpe_encode_from_merges production split, with the same build-under-
    scratch-then-rename recipe as ``_ivf_index_path``."""
    import hashlib
    import os
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "documents.parquet")
    files = [src]
    if os.path.isdir(src):
        files = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(src)
            for f in fs
            if not f.startswith((".", "_"))
        )
    h = hashlib.sha256(f"bpe-merges-v1-{n_merges}\n".encode())
    for p in files:
        st = os.stat(p)
        h.update(
            f"{os.path.relpath(p, sf_dir)}|{st.st_size}|{st.st_mtime_ns}\n".encode()
        )
    path = os.path.join(
        tempfile.gettempdir(), f"bpe_merges_{h.hexdigest()[:16]}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        scratch = tempfile.mkdtemp(prefix="bpe_build_")
        try:
            build = os.path.join(scratch, "merges")
            _tx.write_bpe_merges(
                _t(spark, sf_dir, "documents"),
                build,
                n_merges=n_merges,
                checkpoint_every=8,
            )
            try:
                os.rename(build, path)
            except OSError:
                pass  # concurrent run won the rename
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    return path


@_entry(
    "bpe_encode_from_artifact_deep",
    "Tokenizer APPLICATION at depth: documents encoded against the "
    "PERSISTED depth-64 merge artifact (write_bpe_merges → "
    "bpe_encode_from_merges, the production freeze/serve split) — the "
    "deep trainer's output exercised through the serving path.  Encode "
    "cost is depth-independent by construction: ONE broadcast of the "
    "ordered merge array and one aggregate fold per vocabulary entry, "
    "never per corpus row.",
    _duck_bpe_ctes(64, materialized=True)
    + """,
vocab AS (
  SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS w_tokens,
         CAST(length(word) AS BIGINT) AS w_chars
  FROM v64),
dw AS (
  SELECT doc_id, unnest(t) AS word FROM tok)
SELECT doc_id, COUNT(*) AS n_words,
       CAST(SUM(w_chars) AS BIGINT) AS n_chars,
       CAST(SUM(w_tokens) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(w_chars) AS DOUBLE) / SUM(w_tokens) AS chars_per_token
FROM dw JOIN vocab USING (word)
WHERE word IS NOT NULL AND word != ''
GROUP BY doc_id""",
)
def _q_bpe_encode_from_artifact_deep(spark, sf_dir):
    path = _bpe_artifact_path(spark, sf_dir, n_merges=64)
    return _tx.bpe_encode_from_merges(
        spark, _t(spark, sf_dir, "documents"), path
    )


@_entry(
    "vocab_growth_curve",
    "Heaps-law diagnostic: cumulative tokens vs cumulative distinct "
    "types over a 10-bin doc_id-range prefix sweep — each word "
    "contributes its FIRST bin, so both shuffles are (word|bin)-narrow "
    "and the cumulative fold runs over 10 summary rows.",
    f"""WITH ids AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
binned AS (
  SELECT least(CAST(10 AS BIGINT),
               CAST(floor((doc_id - lo) * 10 / (hi - lo + 1)) AS BIGINT) + 1)
           AS bin,
         {_DUCK_TOKS} AS toks
  FROM documents, ids),
w AS (SELECT bin, unnest(toks) AS word FROM binned),
wf AS (SELECT bin, word FROM w WHERE word IS NOT NULL AND word != ''),
tpb AS (SELECT bin, COUNT(*) AS n_tokens FROM wf GROUP BY bin),
nt AS (SELECT bin, COUNT(*) AS n_new_types FROM (
         SELECT word, MIN(bin) AS bin FROM wf GROUP BY word) GROUP BY bin),
pb AS (
  SELECT tpb.bin, n_tokens, COALESCE(n_new_types, 0) AS n_new_types
  FROM tpb LEFT JOIN nt ON tpb.bin = nt.bin)
SELECT CAST(bin AS INT) AS bin,
       CAST(SUM(n_tokens) OVER (ORDER BY bin) AS BIGINT) AS n_tokens_cum,
       CAST(SUM(n_new_types) OVER (ORDER BY bin) AS BIGINT) AS n_types_cum,
       CAST(SUM(n_new_types) OVER (ORDER BY bin) AS DOUBLE)
         / SUM(n_tokens) OVER (ORDER BY bin) AS type_token_ratio
FROM pb""",
)
def _q_vocab_growth(spark, sf_dir):
    return _tx.vocab_growth_curve(_t(spark, sf_dir, "documents"))


@_entry(
    "curriculum_stages",
    "Length-based curriculum assignment: global ntile over "
    "(token count, doc_id) gives each document a training stage 1..4.  "
    "The window shuffles two ints per doc, never text.",
    f"""WITH s AS (SELECT doc_id, coalesce(source, '{_tx.UNKNOWN_SOURCE}') AS source,
                   CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens
            FROM documents)
SELECT doc_id, source, n_tokens,
       ntile(4) OVER (ORDER BY n_tokens, doc_id) AS stage
FROM s""",
)
def _q_curriculum(spark, sf_dir):
    return _tx.curriculum_stages(
        _t(spark, sf_dir, "documents"), n_stages=4, exact=True
    )


@_entry(
    "curriculum_stages_sampled",
    "Scale-safe curriculum assignment: approx_percentile token-count "
    "edges + 1-row broadcast + row-local stage bucketing — the global "
    "ntile sort eliminated; since round 8 the DEFAULT.  Hash-exact "
    "oracle: _gk_edges_cte edges (GK exact at gate SF) + the same "
    "row-local fold; parity vs the exact twin additionally pinned in "
    "pytest.",
    f"""WITH s AS (SELECT doc_id, coalesce(source, '{_tx.UNKNOWN_SOURCE}') AS source,
                   CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens
            FROM documents),
{_gk_edges_cte('s', 'n_tokens', _Q3, 'rk', 'ed')},
c AS (
  SELECT s.doc_id, COUNT(CASE WHEN CAST(s.n_tokens AS DOUBLE) > e.v THEN 1 END) AS a
  FROM s CROSS JOIN ed e GROUP BY s.doc_id
)
SELECT s.doc_id, s.source, s.n_tokens, CAST(1 + c.a AS INTEGER) AS stage
FROM s JOIN c USING (doc_id)""",
)
def _q_curriculum_sampled(spark, sf_dir):
    return _tx.curriculum_stages(
        _t(spark, sf_dir, "documents"), n_stages=4, exact=False
    )


@_entry(
    "tokenizer_fertility",
    "Per-language tokenizer fertility profile: chars-per-token and "
    "tokens-per-doc from exact integer sums — one map-side-combined "
    "groupBy on language.",
    f"""WITH p AS (SELECT coalesce(lang, '(unknown)') AS lang,
                   len({_DUCK_TOKS}) AS t, length(text) AS c
            FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(t) AS BIGINT) AS n_tokens,
       CAST(SUM(c) AS BIGINT) AS n_chars,
       CAST(SUM(c) AS DOUBLE) / SUM(t) AS chars_per_token,
       CAST(SUM(t) AS DOUBLE) / COUNT(*) AS tokens_per_doc
FROM p GROUP BY lang ORDER BY lang""",
)
def _q_fertility(spark, sf_dir):
    return _tx.tokenizer_fertility(_t(spark, sf_dir, "documents"))


@_entry(
    "lang_source_mismatch",
    "Language/source contamination: docs whose lang differs from their "
    "source's dominant language (ties to the smaller lang).  Counts "
    "frame is |sources|x|langs|; verdict joins back by broadcast — one "
    "corpus scan, no text shuffle.",
    f"""WITH tagged AS (SELECT doc_id, coalesce(source, '{_tx.UNKNOWN_SOURCE}') AS source,
                        coalesce(lang, '(unknown)') AS lang FROM documents),
c AS (SELECT source, lang, COUNT(*) AS n FROM tagged GROUP BY source, lang),
top_n AS (SELECT source, MAX(n) AS n FROM c GROUP BY source),
dom AS (SELECT c.source, MIN(c.lang) AS dominant_lang, MAX(c.n) AS n_dom
        FROM c JOIN top_n USING (source, n) GROUP BY c.source),
tot AS (SELECT source, SUM(n) AS n_total FROM c GROUP BY source),
d AS (SELECT dom.source, dominant_lang,
             CAST(n_dom AS DOUBLE) / n_total AS dominant_share
      FROM dom JOIN tot USING (source))
SELECT doc_id, tagged.source, lang, dominant_lang, dominant_share
FROM tagged JOIN d USING (source)
WHERE lang <> dominant_lang""",
)
def _q_lang_mismatch(spark, sf_dir):
    return _tx.lang_source_mismatch(_t(spark, sf_dir, "documents"))


@_entry(
    "knn_label_accuracy",
    "Embedding-quality eval: leave-one-out 5-NN label accuracy per "
    "label, candidates bounded by IVF cluster (never corpus^2); "
    "neighbor ties -> vec_id, vote ties -> count DESC then label ASC.",
    f"""WITH {_DUCK_IVF_ASSIGN},
tt AS (SELECT t.vec_id, t.label, a.centroid_id, t.v
       FROM t JOIN assign a ON t.vec_id = a.vec_id),
pairs AS (
  SELECT q.vec_id, q.label AS own_label, n.vec_id AS nb_id,
         n.label AS nb_label,
         CASE WHEN {_duck_norm('q.v')} > 0 AND {_duck_norm('n.v')} > 0
              THEN {_duck_dot('q.v', 'n.v')}
                   / ({_duck_norm('q.v')} * {_duck_norm('n.v')})
              ELSE 0.0 END AS cosine
  FROM tt q JOIN tt n ON q.centroid_id = n.centroid_id
  WHERE q.vec_id <> n.vec_id
),
topk AS (
  SELECT vec_id, own_label, nb_label,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, nb_id) AS _r
  FROM pairs QUALIFY _r <= 5
),
votes AS (SELECT vec_id, own_label, nb_label, COUNT(*) AS n_votes
          FROM topk GROUP BY vec_id, own_label, nb_label),
winner AS (
  SELECT vec_id, own_label, nb_label AS predicted_label
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY n_votes DESC, nb_label) AS _w FROM votes)
  WHERE _w = 1
)
SELECT own_label AS label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN predicted_label = own_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(SUM(CASE WHEN predicted_label = own_label THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS accuracy
FROM winner GROUP BY own_label ORDER BY label""",
)
def _q_knn_acc(spark, sf_dir):
    return _sim.knn_label_accuracy(_t(spark, sf_dir, "embeddings"))


@_entry(
    "events_quantiles_histogram",
    "Quantile estimates from a mergeable fixed-grid histogram (256 bins "
    "on [0, 512)): rank = ceil(q*total), linear interpolation inside the "
    "rank's bin — bit-deterministic (integer ranks, one IEEE divide), "
    "error bounded by one bin width.  Everything after the map-side-"
    "combined histogram runs on a |types|x256 frame.",
    """WITH h AS (
  SELECT event_type,
         greatest(0, least(CAST(floor((value - 0.0) / 2.0) AS BIGINT), 255)) AS bin,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2),
c AS (SELECT event_type, bin, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM h),
t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS total FROM h GROUP BY 1),
r AS (SELECT event_type, total, q,
             greatest(CAST(1 AS BIGINT), CAST(ceil(q * total) AS BIGINT)) AS rank
      FROM t, (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q))
SELECT r.event_type, q, total, rank, bin,
       0.0 + 2.0 * (bin + CAST(rank - (cum - n) AS DOUBLE) / n) AS estimate
FROM r JOIN c ON r.event_type = c.event_type
WHERE cum >= rank AND cum - n < rank
ORDER BY r.event_type, q""",
)
def _q_quantiles_hist(spark, sf_dir):
    from admira_etl_project_prueba_spark.operators import sketches as _sk

    ev = load_events(spark, sf_dir)
    return _sk.histogram_quantiles(
        _sk.value_histogram(ev, 0.0, 512.0, 256), (0.5, 0.9, 0.99), 0.0, 512.0, 256
    )


@_entry(
    "events_value_psi",
    "Population stability index per event type between the even- and "
    "odd-id halves of the stream — full 16-bin grid, add-one smoothing, "
    "the grid-rounded-ln + integer*decimal exact-sum seam (psi_num = "
    "sum N_b*lr with denominators cleared; one double divide at the "
    "end).  Everything after the two histograms is model-sized.",
    """WITH hr AS (
  SELECT event_type,
         greatest(0, least(CAST(floor((value - 0.0) / 32.0) AS BIGINT), 15)) AS bin,
         COUNT(*) AS c_r
  FROM events WHERE event_id % 2 = 0 GROUP BY 1, 2),
hc AS (
  SELECT event_type,
         greatest(0, least(CAST(floor((value - 0.0) / 32.0) AS BIGINT), 15)) AS bin,
         COUNT(*) AS c_c
  FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2),
types AS (SELECT DISTINCT event_type FROM (SELECT event_type FROM hr
          UNION ALL SELECT event_type FROM hc)),
grid AS (SELECT event_type, CAST(unnest(range(0, 16)) AS BIGINT) AS bin FROM types),
tr AS (SELECT event_type, SUM(c_r) AS tot_r FROM hr GROUP BY 1),
tc AS (SELECT event_type, SUM(c_c) AS tot_c FROM hc GROUP BY 1),
cells AS (
  SELECT g.event_type, g.bin,
         coalesce(hr.c_r, 0) AS c_r, coalesce(hc.c_c, 0) AS c_c,
         coalesce(tr.tot_r, 0) AS tot_r, coalesce(tc.tot_c, 0) AS tot_c
  FROM grid g
  LEFT JOIN hr ON g.event_type = hr.event_type AND g.bin = hr.bin
  LEFT JOIN hc ON g.event_type = hc.event_type AND g.bin = hc.bin
  LEFT JOIN tr ON g.event_type = tr.event_type
  LEFT JOIN tc ON g.event_type = tc.event_type),
terms AS (
  SELECT event_type, tot_r, tot_c,
         (c_r + 1) * (tot_c + 16) - (c_c + 1) * (tot_r + 16) AS n_b,
         CAST(round(ln((c_r + 1) / CAST(tot_r + 16 AS DOUBLE))
               - ln((c_c + 1) / CAST(tot_c + 16 AS DOUBLE)), 6)
              AS DECIMAL(25,6)) AS lr
  FROM cells)
SELECT event_type,
       CAST(MAX(tot_r) AS BIGINT) AS n_ref,
       CAST(MAX(tot_c) AS BIGINT) AS n_cur,
       CAST(SUM(n_b * lr) AS DOUBLE)
         / (CAST(MAX(tot_r) + 16 AS DOUBLE) * CAST(MAX(tot_c) + 16 AS DOUBLE)) AS psi
FROM terms GROUP BY event_type ORDER BY event_type""",
)
def _q_value_psi(spark, sf_dir):
    from admira_etl_project_prueba_spark.operators import sketches as _sk

    ev = load_events(spark, sf_dir)
    return _sk.value_psi(
        ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1")
    )


_LEAKAGE_SPLIT_SQL = f"""WITH RECURSIVE lshp AS ({_duck_lsh_pairs_sql()}),
strong AS (SELECT doc_a, doc_b FROM lshp WHERE jaccard > 0.5),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM strong
  UNION
  SELECT doc_b AS a, doc_a AS b FROM strong
),
walk(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, w.label FROM walk w JOIN edges e ON e.b = w.node
),
cc AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
assign AS (
  SELECT d.doc_id, COALESCE(cc.component, d.doc_id) AS component
  FROM documents d LEFT JOIN cc ON d.doc_id = cc.node)
SELECT doc_id, component,
       CASE WHEN {_duck_hex60("component || '_' || 'v1'")} % 100 < 80
            THEN 'train' ELSE 'test' END AS split
FROM assign"""


@_entry(
    "leakage_safe_split",
    "Near-dup-aware train/test split: the split hashes the duplicate "
    "CLUSTER id (star connected components over banded LSH pairs), so a "
    "doc and its near-duplicates always share a split — the eval-"
    "contamination guard a per-doc split cannot give.  Row-local hash "
    "after the clustering the dedup pipeline already runs.",
    _LEAKAGE_SPLIT_SQL,
)
def _q_leakage_split(spark, sf_dir):
    return _tx.leakage_safe_split(_t(spark, sf_dir, "documents"))


@_entry(
    "oov_rate",
    "Per-source out-of-vocabulary rate of the odd-id half against the "
    "even-id half's vocabulary: share of token occurrences unseen in the "
    "reference.  Corpus reduces map-side to (source, token, count); "
    "vocab joins on token; per-source fold shuffles |sources| rows.",
    f"""WITH ref AS (
  SELECT DISTINCT token FROM (
    SELECT unnest({_DUCK_TOKS}) AS token FROM documents WHERE doc_id % 2 = 0)
  WHERE token IS NOT NULL AND token != ''),
cor AS (
  SELECT source, token, COUNT(*) AS c FROM (
    SELECT coalesce(source, '{_tx.UNKNOWN_SOURCE}') AS source,
           unnest({_DUCK_TOKS}) AS token
    FROM documents WHERE doc_id % 2 = 1)
  WHERE token IS NOT NULL AND token != '' GROUP BY source, token)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN ref.token IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN ref.token IS NULL THEN c ELSE 0 END) AS DOUBLE)
         / SUM(c) AS oov_rate
FROM cor LEFT JOIN ref ON cor.token = ref.token
GROUP BY source ORDER BY source""",
)
def _q_oov_rate(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return _tx.oov_rate(
        docs.filter("doc_id % 2 = 1"), docs.filter("doc_id % 2 = 0")
    )


_MIXTURE_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
_MIXTURE_BUDGET = 20_000


@_entry(
    "mixture_plan",
    "Data-mixture sampling plan: per-source rate, expected yield, and "
    "saturation verdict for a target weighting and token budget, plus "
    "max_exact_budget (largest budget with no saturated source).  One "
    "groupBy to a |sources|-row frame; weights broadcast as literals.",
    f"""WITH toks AS (
  SELECT coalesce(source, '{_tx.UNKNOWN_SOURCE}') AS source,
         CAST(SUM(len({_DUCK_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
w(source, weight) AS (VALUES {", ".join(f"('{k}', {v})" for k, v in sorted(_MIXTURE_WEIGHTS.items()))}),
base AS (
  SELECT t.source, n_tokens, coalesce(w.weight, 0.0) AS weight,
         coalesce(w.weight, 0.0) * {_MIXTURE_BUDGET} AS target_tokens
  FROM toks t LEFT JOIN w ON t.source = w.source),
f AS (SELECT MIN(n_tokens / weight) AS max_exact_budget FROM base WHERE weight > 0)
SELECT source, n_tokens, weight, target_tokens,
       least(1.0, target_tokens / n_tokens) AS rate,
       least(1.0, target_tokens / n_tokens) * n_tokens AS expected_tokens,
       target_tokens > n_tokens AS saturated,
       max_exact_budget
FROM base, f ORDER BY source""",
)
def _q_mixture_plan(spark, sf_dir):
    return _tx.mixture_plan(
        _t(spark, sf_dir, "documents"), _MIXTURE_WEIGHTS, _MIXTURE_BUDGET
    )


@_entry(
    "packing_stats",
    "Sequence-packing efficiency per shard: sequences the packed stream "
    "cuts into (exact integer ceil), tail waste, utilization, and docs "
    "straddling a pack boundary.  Rides the per-shard cumsum window, "
    "then folds to a |shards|-row report.",
    f"""WITH toks AS (
  SELECT doc_id, len({_DUCK_TOKS}) AS n_tokens, doc_id // 100 AS shard
  FROM documents),
p AS (
  SELECT shard, doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - n_tokens AS start_offset
  FROM toks),
q AS (SELECT shard, n_tokens, start_offset,
             start_offset // 512 AS pack_id FROM p)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST((SUM(n_tokens) + 511) // 512 AS BIGINT) AS n_sequences,
       CAST(((SUM(n_tokens) + 511) // 512) * 512 - SUM(n_tokens) AS BIGINT)
         AS tail_waste_tokens,
       CAST(SUM(n_tokens) AS DOUBLE)
         / (((SUM(n_tokens) + 511) // 512) * 512) AS utilization,
       CAST(SUM(CASE WHEN (start_offset + n_tokens - 1) // 512 > pack_id
                THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling
FROM q GROUP BY shard ORDER BY shard""",
)
def _q_packing_stats(spark, sf_dir):
    return _tx.packing_stats(
        _t(spark, sf_dir, "documents"), token_budget=512, docs_per_shard=100
    )


@_entry(
    "corpus_health_report",
    "One-frame corpus health dashboard in long form (section, key, "
    "value): size, duplication share, shingle-sharing rate, per-language "
    "fertility, lang/source contamination rate, quality keep rate.  "
    "Every value is a ratio of exact integer aggregates with one IEEE "
    "divide — bit-identical on any engine/partitioning.",
    f"""WITH tok AS (
  SELECT doc_id, {_DUCK_TOKS} AS t, length(text) AS c,
         coalesce(lang, '(unknown)') AS lang,
         coalesce(source, '{_tx.UNKNOWN_SOURCE}') AS source
  FROM documents),
size_agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(len(t)) AS BIGINT) AS tk FROM tok),
dup_agg AS (
  SELECT COUNT(*) AS n,
         COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS d
  FROM documents),
sg AS (SELECT doc_id, {_DUCK_SHINGLES} AS shingles FROM tok),
shs AS (SELECT doc_id, {_DUCK_SH} AS sh FROM sg),
rws AS (SELECT doc_id, unnest(sh) AS h FROM shs),
dfc AS (SELECT h, COUNT(*) AS df FROM rws GROUP BY h),
nov AS (SELECT CAST(COUNT(*) AS BIGINT) AS s,
               CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS shd
        FROM rws JOIN dfc USING (h)),
c2 AS (SELECT source, lang, COUNT(*) AS n FROM tok GROUP BY source, lang),
topn AS (SELECT source, MAX(n) AS n FROM c2 GROUP BY source),
dom AS (SELECT c2.source, MIN(c2.lang) AS dominant_lang
        FROM c2 JOIN topn USING (source, n) GROUP BY c2.source),
mm AS (SELECT CAST(SUM(CASE WHEN tok.lang <> dom.dominant_lang THEN 1 ELSE 0 END) AS BIGINT) AS m,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM tok JOIN dom USING (source)),
qf AS ({_duck_quality_filter_sql()}),
qa AS (SELECT CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS k,
              CAST(COUNT(*) AS BIGINT) AS n FROM qf)
SELECT * FROM (
  SELECT 'size' AS section, 'n_docs' AS key, CAST(n AS DOUBLE) AS value FROM size_agg
  UNION ALL SELECT 'size', 'n_tokens', CAST(tk AS DOUBLE) FROM size_agg
  UNION ALL SELECT 'size', 'tokens_per_doc', CAST(tk AS DOUBLE) / n FROM size_agg
  UNION ALL SELECT 'dup', 'dup_share', CAST(n - d AS DOUBLE) / n FROM dup_agg
  UNION ALL SELECT 'novelty', 'shared_shingle_rate',
    CASE WHEN s > 0 THEN CAST(shd AS DOUBLE) / s ELSE 0.0 END FROM nov
  UNION ALL SELECT 'fertility', lang, CAST(SUM(c) AS DOUBLE) / SUM(len(t))
    FROM tok GROUP BY lang
  UNION ALL SELECT 'lang_mismatch', 'mismatch_rate', CAST(m AS DOUBLE) / n FROM mm
  UNION ALL SELECT 'quality', 'kept_fraction', CAST(k AS DOUBLE) / n FROM qa
) ORDER BY section, key""",
)
def _q_health_report(spark, sf_dir):
    from admira_etl_project_prueba_spark.operators.profile import (
        corpus_health_report,
    )

    return corpus_health_report(_t(spark, sf_dir, "documents"))


@_entry(
    "kwic_spark",
    "Keyword-in-context concordance for 'spark': every occurrence with "
    "3 tokens of left/right context.  Positional explode filters to the "
    "term BEFORE any shuffle (volume = term df, not corpus tokens); "
    "context slicing is row-local on matched rows only.",
    f"""WITH tok AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
hits AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, t
  FROM tok, unnest(range(1, len(t) + 1)) AS u(i)
  WHERE t[CAST(i AS INT)] = 'spark')
SELECT doc_id, pos,
       coalesce(array_to_string(t[greatest(1, pos + 1 - 3) : pos], ' '), '') AS left_ctx,
       coalesce(array_to_string(t[pos + 2 : pos + 4], ' '), '') AS right_ctx
FROM hits ORDER BY doc_id, pos""",
)
def _q_kwic(spark, sf_dir):
    return _tx.kwic(_t(spark, sf_dir, "documents"), "spark", width=3)


@_entry(
    "embedding_drift",
    "Per-label L2 shift between the decimal-exact class prototypes of "
    "the even- and odd-id halves — the embedding-side drift monitor "
    "(sibling of token-KL and value-PSI).  Squared dim differences are "
    "decimal(25,6)-quantized before the cross-dim sum, so the sqrt sees "
    "a bit-identical argument on any engine; everything after the two "
    "centroid passes is model-sized.",
    """WITH ea AS (
  SELECT label, CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
         unnest(embedding) AS val
  FROM embeddings WHERE vec_id % 2 = 0),
eb AS (
  SELECT label, CAST(unnest(range(len(embedding))) AS INTEGER) AS dim,
         unnest(embedding) AS val
  FROM embeddings WHERE vec_id % 2 = 1),
ca AS (SELECT label, dim,
              CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS c, COUNT(*) AS n
       FROM ea GROUP BY label, dim),
cb AS (SELECT label, dim,
              CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(25,6))) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS c, COUNT(*) AS n
       FROM eb GROUP BY label, dim),
j AS (SELECT ca.label,
             CAST(MAX(ca.n) AS BIGINT) AS n_ref,
             CAST(MAX(cb.n) AS BIGINT) AS n_cur,
             SUM(CAST((ca.c - cb.c) * (ca.c - cb.c) AS DECIMAL(25,6))) AS ss
      FROM ca JOIN cb USING (label, dim) GROUP BY ca.label)
SELECT label, n_ref, n_cur, sqrt(CAST(ss AS DOUBLE)) AS l2_shift
FROM j ORDER BY label""",
)
def _q_embedding_drift(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return _sim.embedding_drift(
        emb.filter("vec_id % 2 = 0"), emb.filter("vec_id % 2 = 1")
    )


def _duck_kcore_sql(k: int = 3, iters: int = 8) -> str:
    """Unrolled DuckDB twin of graph.k_core over the co-supply graph:
    one (degree-filter → edge-prune) CTE pair per peeling round."""
    ctes = [
        f"""e AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_SHARED})""",
        "s0 AS MATERIALIZED (SELECT u, v FROM (SELECT u, v FROM e UNION SELECT v, u FROM e))",
    ]
    prev = "s0"
    for i in range(1, iters + 1):
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT u FROM (SELECT u, COUNT(*) AS deg FROM {prev} "
            f"GROUP BY u) WHERE deg >= {k})"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT s.u, s.v FROM {prev} s "
            f"JOIN a{i} x ON s.u = x.u JOIN a{i} y ON s.v = y.u)"
        )
        prev = f"s{i}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
fd AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM {prev} GROUP BY u),
nodes AS (SELECT DISTINCT u AS node FROM s0)
SELECT node, coalesce(fd.deg, CAST(0 AS BIGINT)) AS degree,
       coalesce(fd.deg, CAST(0 AS BIGINT)) >= {k} AS in_kcore
FROM nodes LEFT JOIN fd ON nodes.node = fd.u
ORDER BY node"""
    )


@_entry(
    "cosupply_kcore",
    "k-core peeling (k=3, 8 fixed rounds) over the min-support co-supply "
    "graph: every supplier with its final in-subgraph degree and a "
    "dense-core verdict.  One degree agg + two endpoint semi-joins of "
    "2-int edges per round (TH(m), PageRank's per-round bound); edge "
    "frame localCheckpointed so no round replays its predecessors.",
    _duck_kcore_sql(),
)
def _q_kcore(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_suppkey")).alias("s"))
        .selectExpr(
            "explode(flatten(transform(s, (x, i) -> "
            "transform(slice(s, i + 2, size(s)), y -> struct(x AS u, y AS v))"
            "))) AS p"
        )
        .selectExpr("p.u", "p.v")
        .filter("u < v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _TRI_MIN_SHARED)
        .select("u", "v")
    )
    return _graph.k_core(edges, k=3, iters=8)


@_entry(
    "events_anomaly_dow",
    "Seasonality-adjusted anomaly flags: day totals z-scored against the "
    "type's SAME-day-of-week distribution (weekly-pattern breaks that "
    "the plain z-score washes out).  Dow = epoch-day mod 7 (engine-"
    "agnostic integer arithmetic); decimal moments; |types|x7 stats "
    "frame broadcast back.",
    f"""WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         {_DSUM.format(x='value')} AS day_value
  FROM events GROUP BY 1, 2
),
dd AS (
  SELECT *, CAST((CAST(day AS DATE) - DATE '1970-01-01') % 7 AS INTEGER) AS dow
  FROM daily
),
stats AS (
  SELECT event_type, dow, COUNT(*) AS n_days,
         {_DSUM.format(x='day_value')} AS s1,
         {_DSUM.format(x='day_value * day_value')} AS s2
  FROM dd GROUP BY 1, 2
),
j AS (
  SELECT d.event_type, d.day, d.dow, d.day_value,
         s1 / n_days AS mean,
         sqrt(greatest(s2 / n_days - (s1 / n_days) * (s1 / n_days), 0.0)) AS std
  FROM dd d JOIN stats USING (event_type, dow)
)
SELECT event_type, day, dow, day_value,
       CASE WHEN std > 0 THEN (day_value - mean) / std END AS zscore_dow,
       abs(COALESCE(CASE WHEN std > 0 THEN (day_value - mean) / std END, 0.0)) > 2.0
         AS is_anomaly
FROM j ORDER BY event_type, day""",
)
def _q_anomaly_dow(spark, sf_dir):
    return analytics.events_anomaly_dow(load_events(spark, sf_dir))


@_entry(
    "user_rfm_segments",
    "RFM segmentation: per-user recency/frequency/monetary quartiles "
    "(ntile with user_id tie-breaks, data-derived anchor date, decimal "
    "monetary sums) + the 3-digit segment code.  One user-grain "
    "aggregate then three text-free global windows.",
    f"""WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
anchor AS (SELECT MAX(ts) AS a FROM p),
u AS (
  SELECT user_id,
         date_diff('day', CAST(MAX(ts) AS DATE),
                   CAST((SELECT a FROM anchor) AS DATE)) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         {_DSUM.format(x='value')} AS monetary
  FROM p GROUP BY user_id)
SELECT user_id, recency_days, frequency, monetary,
       ntile(4) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
       ntile(4) OVER (ORDER BY frequency, user_id) AS f_score,
       ntile(4) OVER (ORDER BY monetary, user_id) AS m_score,
       CAST(ntile(4) OVER (ORDER BY recency_days DESC, user_id) AS VARCHAR)
         || CAST(ntile(4) OVER (ORDER BY frequency, user_id) AS VARCHAR)
         || CAST(ntile(4) OVER (ORDER BY monetary, user_id) AS VARCHAR) AS segment
FROM u ORDER BY user_id""",
)
def _q_rfm(spark, sf_dir):
    return analytics.user_rfm_segments(load_events(spark, sf_dir), exact=True)


@_entry(
    "user_rfm_segments_sampled",
    "Scale-safe RFM: ONE approx_percentile aggregate yields all three "
    "edge arrays (recency/frequency/monetary), broadcast 1-row, buckets "
    "assigned row-locally — replaces the three consecutive global ntile "
    "sorts with zero global order; since round 8 the DEFAULT.  "
    "Hash-exact oracle: three _gk_edges_cte rank CTEs (GK edges exact "
    "at gate SF) + the same row-local comparison folds; ±1-bucket "
    "parity vs the exact twin additionally pinned in pytest.",
    f"""WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
anchor AS (SELECT MAX(ts) AS a FROM p),
u AS (
  SELECT user_id,
         date_diff('day', CAST(MAX(ts) AS DATE),
                   CAST((SELECT a FROM anchor) AS DATE)) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         {_DSUM.format(x='value')} AS monetary
  FROM p GROUP BY user_id),
{_gk_edges_cte('u', 'recency_days', _Q3, 'rkr', 'edr')},
{_gk_edges_cte('u', 'frequency', _Q3, 'rkf', 'edf')},
{_gk_edges_cte('u', 'monetary', _Q3, 'rkm', 'edm')},
s AS (
  SELECT u.user_id,
         1 + (SELECT COUNT(*) FROM edr e
              WHERE CAST(u.recency_days AS DOUBLE) <= e.v) AS r_score,
         1 + (SELECT COUNT(*) FROM edf e
              WHERE CAST(u.frequency AS DOUBLE) > e.v) AS f_score,
         1 + (SELECT COUNT(*) FROM edm e
              WHERE u.monetary > e.v) AS m_score
  FROM u
)
SELECT u.user_id, u.recency_days, u.frequency, u.monetary,
       CAST(s.r_score AS INTEGER) AS r_score,
       CAST(s.f_score AS INTEGER) AS f_score,
       CAST(s.m_score AS INTEGER) AS m_score,
       CAST(s.r_score AS VARCHAR) || CAST(s.f_score AS VARCHAR)
         || CAST(s.m_score AS VARCHAR) AS segment
FROM u JOIN s USING (user_id)""",
)
def _q_rfm_sampled(spark, sf_dir):
    return analytics.user_rfm_segments(load_events(spark, sf_dir), exact=False)


@_entry(
    "events_position_attribution",
    "U-shaped multi-touch attribution: 40/20/40 first/middles/last "
    "credit per purchase (1 touch 100%, 2 touches 50/50), decimal "
    "shares with the per-conversion rounding residual on the first "
    "touch (credit reconciles to the conversion count exactly), "
    "no-touch conversions bucketed 'unattributed'.  Same user-keyed "
    "equi-join shape as linear attribution.",
    """WITH t AS (
  SELECT user_id, event_type AS touch_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
         event_id AS touch_id
  FROM events WHERE event_type IN ('click', 'view')
),
c AS (
  SELECT user_id, event_id AS conv_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS cus, value
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT conv_id, value, touch_type, tus, touch_id
  FROM c JOIN t USING (user_id)
  WHERE tus < cus AND cus - tus <= CAST(604800 AS BIGINT) * 1000000
),
per_conv AS (
  SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_touches FROM pairs GROUP BY 1
),
shares AS (
  SELECT conv_id, touch_type,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY tus, touch_id) AS rn,
         n_touches, value,
         CAST(value AS DECIMAL(25,6)) AS vdec
  FROM pairs JOIN per_conv USING (conv_id)
),
wsh AS (
  SELECT conv_id, touch_type, rn, n_touches, vdec,
         CAST(CAST(floor((CASE WHEN n_touches = 1 THEN CAST(1.0 AS DOUBLE)
              WHEN n_touches = 2 THEN CAST(0.5 AS DOUBLE)
              WHEN rn = 1 OR rn = n_touches THEN CAST(0.4 AS DOUBLE)
              ELSE CAST(0.2 AS DOUBLE) / (n_touches - 2) END) * 1000000.0 + 0.5) AS BIGINT) * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(25,6))
           AS base_credit,
         CAST(CAST(floor((value * (CASE WHEN n_touches = 1 THEN CAST(1.0 AS DOUBLE)
              WHEN n_touches = 2 THEN CAST(0.5 AS DOUBLE)
              WHEN rn = 1 OR rn = n_touches THEN CAST(0.4 AS DOUBLE)
              ELSE CAST(0.2 AS DOUBLE) / (n_touches - 2) END)) * 1000000.0 + 0.5) AS BIGINT) * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(25,6))
           AS base_rev
  FROM shares
),
-- per-conversion totals are decimal window sums of the SAME rows being
-- released, so the residual reconciles on any engine by construction
tot AS (
  SELECT *,
         CAST(SUM(base_credit) OVER (PARTITION BY conv_id) AS DECIMAL(25,6))
           AS credit_total,
         CAST(SUM(base_rev) OVER (PARTITION BY conv_id) AS DECIMAL(25,6))
           AS rev_total
  FROM wsh
),
credited AS (
  SELECT touch_type,
         CAST(SUM(base_credit + CASE WHEN rn = 1
                  THEN CAST(1.0 AS DECIMAL(25,6)) - credit_total
                  ELSE CAST(0.0 AS DECIMAL(25,6)) END) AS DOUBLE)
           AS attributed_conversions,
         CAST(SUM(base_rev + CASE WHEN rn = 1
                  THEN vdec - rev_total
                  ELSE CAST(0.0 AS DECIMAL(25,6)) END) AS DOUBLE)
           AS attributed_revenue
  FROM tot GROUP BY touch_type
),
un AS (
  SELECT 'unattributed' AS touch_type,
         CAST(COUNT(*) AS DOUBLE) AS attributed_conversions,
         coalesce(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 0.0)
           AS attributed_revenue
  FROM c LEFT JOIN per_conv USING (conv_id) WHERE n_touches IS NULL
)
SELECT * FROM credited UNION ALL SELECT * FROM un""",
)
def _q_position_attr(spark, sf_dir):
    return analytics.events_position_attribution(load_events(spark, sf_dir))


@_entry(
    "basket_part_lift",
    "Market-basket association rules: part pairs co-occurring in >= 3 "
    "orders with support, both confidences, and lift = n_ab*N/(n_a*n_b) "
    "(one IEEE divide of exact integer products), top 50 by lift.  "
    "Grouped row-local pair expansion (basket-size-bounded) shuffles "
    "lineitem once; item counts broadcast into the pruned pair frame.",
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM li),
item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item FROM li GROUP BY 1),
p AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
SELECT pa AS part_a, pb AS part_b, n_ab,
       ia.n_item AS n_a, ib.n_item AS n_b,
       CAST(n_ab AS DOUBLE) / ia.n_item AS confidence_a_to_b,
       CAST(n_ab AS DOUBLE) / ib.n_item AS confidence_b_to_a,
       CAST(n_ab AS DOUBLE) * n_orders / (CAST(ia.n_item AS DOUBLE) * ib.n_item)
         AS lift
FROM p JOIN item ia ON p.pa = ia.l_partkey
       JOIN item ib ON p.pb = ib.l_partkey
       CROSS JOIN n
ORDER BY lift DESC, part_a, part_b LIMIT 50""",
)
def _q_basket_lift(spark, sf_dir):
    return analytics.basket_part_lift(_t(spark, sf_dir, "lineitem"))


@_entry(
    "events_decay_attribution",
    "Time-decay multi-touch attribution: weight halves per day of touch "
    "age (exact powers of two, so per-conversion weight sums are "
    "IEEE-exact in any order), shares decimal-rounded with the residual "
    "on the first touch — credit reconciles to the conversion count "
    "exactly; no-touch conversions bucketed 'unattributed'.",
    f"""WITH t AS (
  SELECT user_id, event_type AS touch_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
         event_id AS touch_id
  FROM events WHERE event_type IN ('click', 'view')
),
c AS (
  SELECT user_id, event_id AS conv_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS cus, value
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT conv_id, value, touch_type, tus, touch_id,
         CAST(1.0 AS DOUBLE)
           / CAST((CAST(1 AS BIGINT) << CAST((cus - tus) // 86400000000 AS INTEGER))
                  AS DOUBLE) AS w
  FROM c JOIN t USING (user_id)
  WHERE tus < cus AND cus - tus <= CAST(604800 AS BIGINT) * 1000000
),
shares AS (
  SELECT conv_id, touch_type,
         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY tus, touch_id) AS rn,
         {_dec6("w / SUM(w) OVER (PARTITION BY conv_id)")} AS base_credit,
         {_dec6("value * w / SUM(w) OVER (PARTITION BY conv_id)")} AS base_rev,
         CAST(value AS DECIMAL(25,6)) AS vdec
  FROM pairs
),
tot AS (
  SELECT *, SUM(base_credit) OVER (PARTITION BY conv_id) AS credit_total,
         SUM(base_rev) OVER (PARTITION BY conv_id) AS rev_total
  FROM shares
),
credited AS (
  SELECT touch_type,
         CAST(SUM(base_credit + CASE WHEN rn = 1
                  THEN CAST(1.0 AS DECIMAL(25,6)) - CAST(credit_total AS DECIMAL(25,6))
                  ELSE CAST(0.0 AS DECIMAL(25,6)) END) AS DOUBLE)
           AS attributed_conversions,
         CAST(SUM(base_rev + CASE WHEN rn = 1
                  THEN vdec - CAST(rev_total AS DECIMAL(25,6))
                  ELSE CAST(0.0 AS DECIMAL(25,6)) END) AS DOUBLE)
           AS attributed_revenue
  FROM tot GROUP BY touch_type
),
un AS (
  SELECT 'unattributed' AS touch_type,
         CAST(COUNT(*) AS DOUBLE) AS attributed_conversions,
         coalesce(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 0.0)
           AS attributed_revenue
  FROM c WHERE conv_id NOT IN (SELECT conv_id FROM pairs)
)
SELECT * FROM credited UNION ALL SELECT * FROM un""",
)
def _q_decay_attr(spark, sf_dir):
    return analytics.events_decay_attribution(load_events(spark, sf_dir))


@_entry(
    "events_session_paths",
    "Top-25 in-session event-type journeys ('view>view>purchase'): the "
    "behavioral complement to hypothesized funnels.  Rides the proven "
    "sessionize core; ordered path via sort-by-(ts,event_id); one short "
    "string shuffles per session; share is one IEEE divide of counts.",
    f"""WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG({_SESS_TS_US.format(x='ts')}) OVER w IS NULL
                   OR {_SESS_TS_US.format(x='ts')} - LAG({_SESS_TS_US.format(x='ts')}) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY {_SESS_TS_US.format(x='ts')}, event_id)
           AS path
  FROM sess GROUP BY user_id, session_id
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM paths)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS DOUBLE) / (SELECT n_total FROM tot) AS share,
       CASE WHEN path LIKE '%purchase%' THEN true ELSE false END AS converting
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 25""",
)
def _q_session_paths(spark, sf_dir):
    return analytics.events_session_paths(load_events(spark, sf_dir))


@_entry(
    "cohort_ltv",
    "Weekly cohort LTV curves: per-offset purchase revenue and the "
    "decimal-exact CUMULATIVE revenue per cohort user (the money "
    "companion to cohort retention).  One user-key shuffle; the "
    "cumulative window runs on the calendar-bounded matrix.",
    """WITH first AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cw
  FROM events GROUP BY user_id
),
sizes AS (SELECT cw, CAST(COUNT(*) AS BIGINT) AS n_cohort_users
          FROM first GROUP BY cw),
p AS (
  SELECT e.user_id, date_trunc('week', e.ts) AS aw,
         CAST(e.value AS DECIMAL(25,6)) AS v, f.cw
  FROM events e JOIN first f USING (user_id)
  WHERE e.event_type = 'purchase'
),
cells AS (
  SELECT cw,
         CAST((CAST(aw AS DATE) - CAST(cw AS DATE)) // 7 AS INTEGER)
           AS week_offset,
         SUM(v) AS revenue
  FROM p GROUP BY 1, 2
),
cum AS (
  SELECT *, SUM(revenue) OVER (PARTITION BY cw ORDER BY week_offset
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_revenue
  FROM cells
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, week_offset,
       n_cohort_users,
       CAST(revenue AS DOUBLE) AS revenue,
       CAST(cum_revenue AS DOUBLE) AS cum_revenue,
       CAST(cum_revenue AS DOUBLE) / n_cohort_users AS cum_ltv_per_user
FROM cum JOIN sizes USING (cw)
ORDER BY cohort_week, week_offset""",
)
def _q_cohort_ltv(spark, sf_dir):
    return analytics.cohort_ltv(load_events(spark, sf_dir))


@_entry(
    "supplier_lead_time",
    "Supplier lead-time scorecard: whole-day ship lag per line, exact "
    "integer-sum mean and exact p50/p90 via per-supplier ceil-rank "
    "row_number picks (deterministic order/line tie-break) — two "
    "shuffles of 3-int rows, no approximation.",
    """WITH lags AS (
  SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS lag_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
c AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(lag_days) AS BIGINT) AS lag_sum
      FROM lags GROUP BY 1),
r AS (
  SELECT l_suppkey, lag_days,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY lag_days, l_orderkey, l_linenumber) AS rn
  FROM lags
)
SELECT r.l_suppkey AS suppkey, c.n_lines,
       CAST(c.lag_sum AS DOUBLE) / c.n_lines AS mean_days,
       CAST(MAX(CASE WHEN rn = greatest(CAST(1 AS BIGINT),
                     CAST(ceil(c.n_lines * 0.5) AS BIGINT))
                THEN lag_days END) AS INTEGER) AS p50_days,
       CAST(MAX(CASE WHEN rn = greatest(CAST(1 AS BIGINT),
                     CAST(ceil(c.n_lines * 0.9) AS BIGINT))
                THEN lag_days END) AS INTEGER) AS p90_days
FROM r JOIN c USING (l_suppkey)
GROUP BY r.l_suppkey, c.n_lines, c.lag_sum
ORDER BY suppkey""",
)
def _q_lead_time(spark, sf_dir):
    return analytics.supplier_lead_time(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    )
