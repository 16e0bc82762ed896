"""The reference's analytics view layer as parameterized SQL definitions.

Eleven named relations (SURVEY.md §7 step 6):

- 4 passthrough views (P1 — `15_create_prod_database.sql:53-78`),
- V_CAMPAIGNS_SUMMARY (`15:93-119`): projection + DATEDIFF/CASE computed
  columns,
- V_IMPRESSIONS_DAILY / V_CLICKS_DAILY / V_CONVERSIONS_DAILY
  (`15:122-189`): multi-key daily aggregates with conditional counts and
  ratio metrics,
- V_CAMPAIGN_PERFORMANCE (`15:192-242`): partial-agg CTEs + composite-key
  left joins + COALESCE/NULLIF funnel ratios + activity filter,
- EXT-side V_CAMPAIGN_PERFORMANCE fan-out variant with COUNT(DISTINCT)
  (`10_external_tables.sql:111-134`) and V_DAILY_METRICS (`10:139-152`).

Definitions are **SQL text templates** keyed by source-table placeholders
(`{campaigns}` …): the sync job formats them against whichever catalog
path is active — the same EXT→CLD name-rewrite the reference performs on
stored view DDL (`16_sync_task_primary.sql:245-252`) without fragile
string surgery.  Text is the replication/drift artifact (sha2-hashed by
the drift job); Spark plans come from ``spark.sql`` on the formatted text,
so Catalyst sees the whole tree (pushdown through views is free).

Spark runs these over Iceberg-style tables partitioned by ``date_key``,
so every date-keyed aggregate prunes partitions; the funnel view's three
CTEs group by (campaign_id, date_key) → Catalyst emits partial+final hash
aggregates and broadcast-joins the 50-row campaign dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BASE_TABLES = ("campaigns", "impressions", "clicks", "conversions")

#: view name → SQL template with {campaigns}/{impressions}/{clicks}/{conversions}
VIEW_DEFS: dict[str, str] = {
    # ---- passthrough (P1, `15:53-78`) --------------------------------
    "campaigns": "SELECT * FROM {campaigns}",
    "impressions": "SELECT * FROM {impressions}",
    "clicks": "SELECT * FROM {clicks}",
    "conversions": "SELECT * FROM {conversions}",
    # ---- V_CAMPAIGNS_SUMMARY (`15:93-119`) ---------------------------
    "v_campaigns_summary": """
        SELECT campaign_id, campaign_name, channel, ad_format, target_region,
               status, budget_usd, daily_budget_usd, target_cpa_usd,
               start_date, end_date, advertiser_name,
               DATEDIFF(CAST(end_date AS DATE), CAST(start_date AS DATE))
                   AS campaign_duration_days,
               CASE WHEN status = 'active' THEN 'Running'
                    WHEN status = 'paused' THEN 'Paused'
                    WHEN status = 'completed' THEN 'Finished'
                    ELSE 'Draft' END AS status_label,
               created_at, updated_at
        FROM {campaigns}
    """,
    # ---- V_IMPRESSIONS_DAILY (`15:122-140`) --------------------------
    "v_impressions_daily": """
        SELECT campaign_id, date_key, geo_region, device_type,
               COUNT(*) AS impression_count,
               SUM(CASE WHEN viewable THEN 1 ELSE 0 END) AS viewable_impressions,
               SUM(cost_usd) AS total_cost_usd,
               AVG(cost_usd) AS avg_cost_per_impression,
               COUNT(DISTINCT publisher_id) AS unique_publishers
        FROM {impressions}
        GROUP BY campaign_id, date_key, geo_region, device_type
    """,
    # ---- V_CLICKS_DAILY (`15:143-163`) -------------------------------
    "v_clicks_daily": """
        SELECT campaign_id, date_key, geo_region, device_type,
               COUNT(*) AS click_count,
               SUM(cost_usd) AS total_click_cost_usd,
               AVG(cost_usd) AS avg_cost_per_click,
               AVG(time_on_site_seconds) AS avg_time_on_site_seconds,
               AVG(pages_viewed) AS avg_pages_viewed,
               SUM(CASE WHEN bounce THEN 1 ELSE 0 END) AS bounce_count,
               ROUND(SUM(CASE WHEN bounce THEN 1 ELSE 0 END) * 100.0
                     / NULLIF(COUNT(*), 0), 2) AS bounce_rate_pct
        FROM {clicks}
        GROUP BY campaign_id, date_key, geo_region, device_type
    """,
    # ---- V_CONVERSIONS_DAILY (`15:166-189`) --------------------------
    "v_conversions_daily": """
        SELECT campaign_id, date_key, conversion_type, geo_region,
               device_type, attribution_model,
               COUNT(*) AS conversion_count,
               SUM(revenue_usd) AS total_revenue_usd,
               AVG(revenue_usd) AS avg_revenue_per_conversion,
               SUM(quantity) AS total_quantity,
               SUM(CASE WHEN new_customer THEN 1 ELSE 0 END)
                   AS new_customer_conversions,
               ROUND(SUM(CASE WHEN new_customer THEN 1 ELSE 0 END) * 100.0
                     / NULLIF(COUNT(*), 0), 2) AS new_customer_rate_pct
        FROM {conversions}
        GROUP BY campaign_id, date_key, conversion_type, geo_region,
                 device_type, attribution_model
    """,
    # ---- V_CAMPAIGN_PERFORMANCE (`15:192-242`) -----------------------
    "v_campaign_performance": """
        WITH impressions_agg AS (
            SELECT campaign_id, date_key, COUNT(*) AS impressions,
                   SUM(cost_usd) AS impression_cost
            FROM {impressions} GROUP BY campaign_id, date_key
        ),
        clicks_agg AS (
            SELECT campaign_id, date_key, COUNT(*) AS clicks,
                   SUM(cost_usd) AS click_cost
            FROM {clicks} GROUP BY campaign_id, date_key
        ),
        conversions_agg AS (
            SELECT campaign_id, date_key, COUNT(*) AS conversions,
                   SUM(revenue_usd) AS revenue
            FROM {conversions} GROUP BY campaign_id, date_key
        )
        SELECT c.campaign_id, c.campaign_name, c.channel, c.advertiser_name,
               COALESCE(i.date_key, cl.date_key, cv.date_key) AS date_key,
               COALESCE(i.impressions, 0) AS impressions,
               COALESCE(cl.clicks, 0) AS clicks,
               COALESCE(cv.conversions, 0) AS conversions,
               COALESCE(i.impression_cost, 0) + COALESCE(cl.click_cost, 0)
                   AS total_cost_usd,
               COALESCE(cv.revenue, 0) AS total_revenue_usd,
               ROUND(COALESCE(cl.clicks, 0) * 100.0
                     / NULLIF(i.impressions, 0), 4) AS ctr_pct,
               ROUND(COALESCE(cv.conversions, 0) * 100.0
                     / NULLIF(cl.clicks, 0), 4) AS conversion_rate_pct,
               ROUND((COALESCE(i.impression_cost, 0) + COALESCE(cl.click_cost, 0))
                     / NULLIF(cv.conversions, 0), 2) AS cost_per_acquisition,
               ROUND(COALESCE(cv.revenue, 0)
                     / NULLIF(COALESCE(i.impression_cost, 0)
                              + COALESCE(cl.click_cost, 0), 0), 2) AS roas
        FROM {campaigns} c
        LEFT JOIN impressions_agg i ON c.campaign_id = i.campaign_id
        LEFT JOIN clicks_agg cl
               ON c.campaign_id = cl.campaign_id AND i.date_key = cl.date_key
        LEFT JOIN conversions_agg cv
               ON c.campaign_id = cv.campaign_id AND i.date_key = cv.date_key
        WHERE i.date_key IS NOT NULL OR cl.date_key IS NOT NULL
           OR cv.date_key IS NOT NULL
    """,
    # ---- EXT fan-out variant (`10:110-134`) --------------------------
    "v_campaign_performance_ext": """
        SELECT c.campaign_id, c.campaign_name, c.channel, c.ad_format,
               c.budget_usd, c.target_cpa_usd, c.target_region, c.status,
               COUNT(DISTINCT i.impression_id) AS total_impressions,
               COUNT(DISTINCT cl.click_id) AS total_clicks,
               COUNT(DISTINCT cv.conversion_id) AS total_conversions,
               SUM(i.cost_usd) AS impression_cost,
               SUM(cl.cost_usd) AS click_cost,
               SUM(cv.revenue_usd) AS total_revenue,
               ROUND(COUNT(DISTINCT cl.click_id)
                     / NULLIF(COUNT(DISTINCT i.impression_id), 0) * 100, 2)
                   AS ctr_pct,
               ROUND(COUNT(DISTINCT cv.conversion_id)
                     / NULLIF(COUNT(DISTINCT cl.click_id), 0) * 100, 2)
                   AS conversion_rate_pct,
               ROUND(SUM(cv.revenue_usd)
                     / NULLIF(SUM(i.cost_usd) + SUM(cl.cost_usd), 0), 2) AS roas
        FROM {campaigns} c
        LEFT JOIN {impressions} i ON c.campaign_id = i.campaign_id
        LEFT JOIN {clicks} cl ON c.campaign_id = cl.campaign_id
        LEFT JOIN {conversions} cv ON c.campaign_id = cv.campaign_id
        GROUP BY c.campaign_id, c.campaign_name, c.channel, c.ad_format,
                 c.budget_usd, c.target_cpa_usd, c.target_region, c.status
    """,
    # ---- V_DAILY_METRICS (`10:139-152`) ------------------------------
    "v_daily_metrics": """
        SELECT i.date_key, i.geo_region, i.device_type,
               COUNT(DISTINCT i.impression_id) AS impressions,
               COUNT(DISTINCT cl.click_id) AS clicks,
               COUNT(DISTINCT cv.conversion_id) AS conversions,
               SUM(i.cost_usd) + COALESCE(SUM(cl.cost_usd), 0) AS total_cost,
               COALESCE(SUM(cv.revenue_usd), 0) AS total_revenue
        FROM {impressions} i
        LEFT JOIN {clicks} cl ON i.impression_id = cl.impression_id
        LEFT JOIN {conversions} cv ON cl.click_id = cv.click_id
        GROUP BY i.date_key, i.geo_region, i.device_type
    """,
}

#: Views the sync job materializes in PROD (the five "MV analogs" the
#: reference's sync proc replays, `16:304-422`; aggregate views only —
#: passthroughs are created per-table from the catalog listing).
AGGREGATE_VIEWS = (
    "v_campaigns_summary",
    "v_impressions_daily",
    "v_clicks_daily",
    "v_conversions_daily",
    "v_campaign_performance",
)


def render(view: str, sources: dict[str, str]) -> str:
    """Format a view template against concrete source table names — the
    EXT→CLD rewrite (`16:245-252`) done by substitution, not str.replace."""
    return VIEW_DEFS[view].format(**sources).strip()


def build(
    spark: SparkSession, view: str, tables: dict[str, DataFrame]
) -> DataFrame:
    """Build a view as a DataFrame over in-memory base DataFrames (temp
    views named after the base tables)."""
    for name in BASE_TABLES:
        tables[name].createOrReplaceTempView(f"_base_{name}")
    sources = {name: f"_base_{name}" for name in BASE_TABLES}
    return spark.sql(render(view, sources))
