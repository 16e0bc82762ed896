"""Declared schemas + enum vocabularies for the advertising star schema.

Transcribed from the reference's ``SCHEMAS`` dict
(`scripts/03_load_iceberg_aws.py:47-129`) and value domains
(`scripts/02_generate_iceberg_data.py:44-49`).  Timestamps/dates are
ISO-8601 **strings** in the reference's Iceberg tables (`03:59-60,72-73`);
we keep them strings and cast exactly where the reference casts
(SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Enum vocabularies — `02_generate_iceberg_data.py:44-49`.
CHANNELS = ["display", "search", "social", "video", "native", "email", "affiliate"]
DEVICE_TYPES = ["desktop", "mobile", "tablet", "connected_tv", "other"]
REGIONS = [
    "US-EAST",
    "US-WEST",
    "US-CENTRAL",
    "CANADA",
    "UK",
    "EU-WEST",
    "EU-CENTRAL",
    "APAC",
]
AD_FORMATS = [
    "banner",
    "interstitial",
    "video_preroll",
    "video_midroll",
    "native_feed",
    "carousel",
]
CONVERSION_TYPES = ["purchase", "signup", "download", "subscription", "lead_form"]
STATUSES = ["active", "paused", "completed", "draft"]
BROWSERS = ["Chrome", "Safari", "Firefox", "Edge", "Other"]
OSES = ["Windows", "macOS", "iOS", "Android", "Linux", "Other"]
AD_POSITIONS = ["above_fold", "below_fold", "sidebar", "in_feed"]
PRODUCT_CATEGORIES = ["Electronics", "Clothing", "Home", "Sports", "Beauty"]
ATTRIBUTION_MODELS = ["last_click", "first_click", "linear", "time_decay"]


def _s(name: str) -> StructField:
    return StructField(name, StringType())


# `03_load_iceberg_aws.py:48-67`
CAMPAIGNS_SCHEMA = StructType(
    [
        _s("campaign_id"),
        _s("campaign_name"),
        _s("channel"),
        _s("ad_format"),
        StructField("budget_usd", DoubleType()),
        StructField("daily_budget_usd", DoubleType()),
        StructField("target_cpa_usd", DoubleType()),
        _s("target_region"),
        _s("status"),
        _s("start_date"),
        _s("end_date"),
        _s("advertiser_name"),
        _s("advertiser_industry"),
        _s("created_at"),
        _s("updated_at"),
    ]
)

# `03_load_iceberg_aws.py:68-88`; partition key date_key (`03:87`)
IMPRESSIONS_SCHEMA = StructType(
    [
        _s("impression_id"),
        _s("campaign_id"),
        _s("timestamp"),
        _s("date_key"),
        StructField("hour", IntegerType()),
        _s("device_type"),
        _s("geo_region"),
        _s("geo_country"),
        _s("geo_city"),
        _s("browser"),
        _s("os"),
        _s("ad_position"),
        StructField("viewable", BooleanType()),
        StructField("cost_usd", DoubleType()),
        _s("publisher_id"),
        _s("placement_id"),
    ]
)

# `03_load_iceberg_aws.py:89-107`; partition key date_key (`03:106`)
CLICKS_SCHEMA = StructType(
    [
        _s("click_id"),
        _s("impression_id"),
        _s("campaign_id"),
        _s("timestamp"),
        _s("date_key"),
        _s("device_type"),
        _s("geo_region"),
        _s("geo_country"),
        _s("landing_page_url"),
        _s("referrer_url"),
        StructField("time_on_site_seconds", IntegerType()),
        StructField("pages_viewed", IntegerType()),
        StructField("bounce", BooleanType()),
        StructField("cost_usd", DoubleType()),
    ]
)

# `03_load_iceberg_aws.py:108-128`; partition key date_key (`03:127`)
CONVERSIONS_SCHEMA = StructType(
    [
        _s("conversion_id"),
        _s("click_id"),
        _s("impression_id"),
        _s("campaign_id"),
        _s("timestamp"),
        _s("date_key"),
        _s("conversion_type"),
        StructField("revenue_usd", DoubleType()),
        StructField("quantity", IntegerType()),
        _s("currency"),
        _s("order_id"),
        _s("product_category"),
        StructField("new_customer", BooleanType()),
        _s("device_type"),
        _s("geo_region"),
        _s("attribution_model"),
    ]
)

#: table → (schema, partition columns) — partition intent per
#: `03_load_iceberg_aws.py:87,106,127` (SURVEY.md §1.2 keeps `date_key`).
TABLES: dict[str, tuple[StructType, list[str]]] = {
    "campaigns": (CAMPAIGNS_SCHEMA, []),
    "impressions": (IMPRESSIONS_SCHEMA, ["date_key"]),
    "clicks": (CLICKS_SCHEMA, ["date_key"]),
    "conversions": (CONVERSIONS_SCHEMA, ["date_key"]),
}

# Monitoring/log tables (FIXTURES.md; `16:48-62`, `31:61-72`, `33:47-59,199-214`).
SYNC_LOG_SCHEMA = StructType(
    [
        StructField("sync_id", LongType()),
        StructField("sync_timestamp", TimestampType()),
        _s("sync_type"),
        _s("source_database"),
        _s("source_schema"),
        _s("object_type"),
        _s("object_name"),
        _s("action"),
        _s("status"),
        StructField("row_count", LongType()),
        _s("error_message"),
        StructField("execution_time_ms", LongType()),
    ]
)

HEARTBEAT_LOG_SCHEMA = StructType(
    [
        StructField("heartbeat_id", LongType()),
        StructField("heartbeat_timestamp", TimestampType()),
        _s("check_type"),
        _s("status"),
        _s("details"),
        _s("error_msg"),
        StructField("cld_table_count", LongType()),
        StructField("prod_view_count", LongType()),
        StructField("replication_lag_seconds", LongType()),
    ]
)

GRANT_AUDIT_LOG_SCHEMA = StructType(
    [
        StructField("audit_id", LongType()),
        StructField("audit_timestamp", TimestampType()),
        _s("object_type"),
        _s("object_name"),
        _s("role_name"),
        _s("privilege"),
        _s("action"),
        _s("status"),
    ]
)

SCHEMA_METADATA_SCHEMA = StructType(
    [
        StructField("export_timestamp", TimestampType()),
        _s("account_name"),
        _s("database_name"),
        _s("schema_name"),
        _s("object_type"),
        _s("object_name"),
        _s("object_definition"),
        _s("object_comment"),
        StructField("created_at", TimestampType()),
        StructField("last_altered", TimestampType()),
        _s("object_hash"),
    ]
)

SCHEMA_DRIFT_LOG_SCHEMA = StructType(
    [
        StructField("drift_id", LongType()),
        StructField("check_timestamp", TimestampType()),
        _s("object_type"),
        _s("schema_name"),
        _s("object_name"),
        _s("drift_type"),
        _s("primary_hash"),
        _s("secondary_hash"),
        _s("primary_definition"),
        _s("secondary_definition"),
        _s("status"),
        StructField("resolved_at", TimestampType()),
        _s("resolved_by"),
    ]
)
