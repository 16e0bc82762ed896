"""Seeded, deterministic, Spark-native advertising data generator.

Port of the reference generator's *semantics*
(`scripts/02_generate_iceberg_data.py:52-220`): campaign dimension with
enum vocabularies, per-campaign impression fan-out with count ~
U[n/2, 2n] (`02:98-101`), clicks sampled from impressions at
``click_rate`` with inherited device/geo and ts+U[1,30]s (`02:136-167`),
conversions sampled from clicks at ``conversion_rate`` with ≤7-day delay
and revenue = campaign ``target_cpa_usd`` × U[0.5,5.0] (`02:170-220`).
Referential integrity holds by construction (children derive from sampled
parent rows, `02:13`).

Architecture (NOT the reference's row-loop pandas approach): every random
draw is a pure column expression seeded by ``xxhash64(entity_id, salt,
seed)``, so the data is deterministic for a given seed, independent of
partitioning, and generates fully parallel on executors:

- campaigns: ``spark.range(n)`` + hash-derived columns (50 rows default).
- impressions: two-level ``explode(sequence(...))`` fan-out — campaigns →
  fixed-size chunks → rows — so task parallelism is ``total/chunk`` even
  though the dimension has only 50 rows; at 100 TB the same plan scales by
  raising campaign count and chunk count, no driver-side loops.
- clicks/conversions: deterministic Bernoulli thinning
  (``u01(id, salt) < rate`` — the P9 sampling operator) + a broadcast join
  back to campaigns for CPA-derived revenue (J9 dict-lookup analog).

IDs are globally sequential (`IMP-%010d` etc., `02:114,150,201`) via
per-campaign offsets computed from the deterministic counts — a 50-row
driver-side cumsum, not a data-dependent collect.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas

_M = float(1 << 31)

# Small deterministic vocabularies standing in for the reference's Faker
# calls (`02:62,72-73,121-122`) — same shape, no external dependency.
ADJECTIVES = ["Bold", "Bright", "Smart", "Prime", "Swift", "Global", "Urban", "Vivid"]
NOUNS = ["Horizon", "Summit", "Pulse", "Beacon", "Venture", "Momentum", "Orbit", "Spark"]
COMPANIES = [
    "Acme Corp",
    "Globex Inc",
    "Initech LLC",
    "Umbrella Co",
    "Stark Industries",
    "Wayne Enterprises",
    "Wonka Ltd",
    "Tyrell Corp",
]
INDUSTRIES = ["retail", "technology", "finance", "travel", "healthcare", "media"]
COUNTRIES = ["US", "CA", "GB", "DE", "FR", "JP", "AU", "BR"]
CITIES = [
    "New York",
    "San Francisco",
    "Chicago",
    "Toronto",
    "London",
    "Berlin",
    "Paris",
    "Sydney",
]


def _h(seed: int, salt: str, *cols: Column) -> Column:
    """Deterministic non-negative 31-bit hash stream."""
    return F.pmod(F.xxhash64(F.lit(seed), F.lit(salt), *cols), F.lit(1 << 31))


def u01(seed: int, salt: str, *cols: Column) -> Column:
    """Deterministic U[0,1) draw keyed by (seed, salt, cols)."""
    return _h(seed, salt, *cols).cast("double") / F.lit(_M)


def uniform(seed: int, salt: str, lo: float, hi: float, *cols: Column) -> Column:
    return F.lit(lo) + u01(seed, salt, *cols) * F.lit(hi - lo)


def uniform_int(seed: int, salt: str, lo: int, hi: int, *cols: Column) -> Column:
    """Deterministic integer draw in [lo, hi] (inclusive)."""
    return (F.lit(lo) + F.pmod(_h(seed, salt, *cols), F.lit(hi - lo + 1))).cast("int")


def choice(seed: int, salt: str, values: list[str], *cols: Column) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.pmod(_h(seed, salt, *cols), F.lit(len(values))) + 1).cast("int"))


def _iso(ts: Column) -> Column:
    """ISO-8601 string form the reference stores (`03:59-60`)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")


@dataclass
class GeneratorConfig:
    """Defaults mirror `02_generate_iceberg_data.py:234-250,289-290`."""

    num_campaigns: int = 50
    impressions_per_campaign: int = 10_000
    click_rate: float = 0.02
    conversion_rate: float = 0.05
    seed: int = 42
    end_date: str = "2026-01-01"  # fixed anchor (reference uses "today")
    window_days: int = 90
    chunk: int = 10_000  # impressions fan-out chunk → task granularity
    extra: dict = field(default_factory=dict)


def campaign_counts(cfg: GeneratorConfig) -> list[int]:
    """Python twin of :func:`uniform_int` for the 50-row offsets cumsum
    (hashlib-based; deterministic and tiny — never data-dependent)."""
    import hashlib

    counts = []
    n = cfg.impressions_per_campaign
    lo, hi = n // 2, 2 * n
    for i in range(cfg.num_campaigns):
        digest = hashlib.md5(f"{cfg.seed}#count#{i}".encode()).digest()
        v = int.from_bytes(digest[:4], "big") % (hi - lo + 1)
        counts.append(lo + v)
    return counts


def generate_campaigns(spark: SparkSession, cfg: GeneratorConfig) -> DataFrame:
    """Campaign dimension (`02:52-82`): 15 columns, enum-valued, seeded."""
    s = cfg.seed
    idx = F.col("id")
    window_start = F.date_sub(F.lit(cfg.end_date).cast("date"), cfg.window_days)
    start_off = uniform_int(s, "start", 0, cfg.window_days - 7, idx)
    duration = uniform_int(s, "dur", 7, 90, idx)
    start_date = F.date_add(window_start, start_off)
    end_date = F.date_add(start_date, duration)
    created = F.to_timestamp(F.date_sub(start_date, uniform_int(s, "created", 1, 30, idx)))
    df = spark.range(cfg.num_campaigns).select(
        F.format_string("CMP-%06d", (idx + 1).cast("int")).alias("campaign_id"),
        F.concat_ws(
            " ", choice(s, "adj", ADJECTIVES, idx), choice(s, "noun", NOUNS, idx), F.lit("Campaign")
        ).alias("campaign_name"),
        choice(s, "channel", schemas.CHANNELS, idx).alias("channel"),
        choice(s, "fmt", schemas.AD_FORMATS, idx).alias("ad_format"),
        F.round(uniform(s, "budget", 1_000, 500_000, idx), 2).alias("budget_usd"),
        F.round(uniform(s, "daily", 100, 10_000, idx), 2).alias("daily_budget_usd"),
        F.round(uniform(s, "cpa", 5, 100, idx), 2).alias("target_cpa_usd"),
        choice(s, "region", schemas.REGIONS, idx).alias("target_region"),
        choice(s, "status", schemas.STATUSES, idx).alias("status"),
        F.date_format(start_date, "yyyy-MM-dd").alias("start_date"),
        F.date_format(end_date, "yyyy-MM-dd").alias("end_date"),
        choice(s, "adv", COMPANIES, idx).alias("advertiser_name"),
        choice(s, "ind", INDUSTRIES, idx).alias("advertiser_industry"),
        _iso(created).alias("created_at"),
        _iso(F.to_timestamp(start_date)).alias("updated_at"),
    )
    return df


def generate_impressions(
    spark: SparkSession, campaigns: DataFrame, cfg: GeneratorConfig
) -> DataFrame:
    """Impression fact (`02:85-133`): only active/completed campaigns
    (`02:95`, the P3 filter), per-campaign count ~ U[n/2, 2n], ts uniform
    in the campaign window, geo = target region with p=0.7 (`02:120`).

    Two-level explode: campaign → ``ceil(cnt/chunk)`` chunk rows →
    ``chunk`` item rows, then the chunk axis is what Spark parallelizes
    after repartition — no 50-task ceiling, no driver loops."""
    s = cfg.seed
    counts = campaign_counts(cfg)
    offsets, acc = [], 0
    for c in counts:
        offsets.append(acc)
        acc += c
    meta = spark.createDataFrame(
        [(i, counts[i], offsets[i]) for i in range(cfg.num_campaigns)],
        "cidx int, cnt int, offset long",
    )
    eligible = (
        campaigns.withColumn(
            "cidx", (F.regexp_extract("campaign_id", r"(\d+)", 1).cast("int") - 1)
        )
        .filter(F.col("status").isin("active", "completed"))
        .join(F.broadcast(meta), "cidx")
    )
    chunked = eligible.select(
        "campaign_id",
        "target_region",
        "start_date",
        "end_date",
        "cnt",
        "offset",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.floor((F.col("cnt") - 1) / cfg.chunk))
        ).alias("chunk_no"),
    ).repartition(spark.sparkContext.defaultParallelism)
    items = chunked.select(
        "campaign_id",
        "target_region",
        "start_date",
        "end_date",
        "offset",
        F.explode(
            F.sequence(
                F.col("chunk_no") * cfg.chunk,
                F.least(F.col("chunk_no") * cfg.chunk + (cfg.chunk - 1), F.col("cnt") - 1),
            )
        ).alias("i"),
    )
    gid = F.col("offset") + F.col("i")
    win_start = F.to_timestamp(F.col("start_date"))
    win_len = F.greatest(
        F.lit(1),
        F.unix_timestamp(F.to_timestamp(F.col("end_date"))) - F.unix_timestamp(win_start),
    )
    ts = F.timestamp_seconds(
        F.unix_timestamp(win_start) + (u01(s, "its", gid) * win_len).cast("long")
    )
    geo = F.when(
        u01(s, "geo", gid) < 0.7, F.col("target_region")
    ).otherwise(choice(s, "geo2", schemas.REGIONS, gid))
    return items.select(
        F.format_string("IMP-%010d", (gid + 1).cast("long")).alias("impression_id"),
        F.col("campaign_id"),
        _iso(ts).alias("timestamp"),
        F.date_format(ts, "yyyy-MM-dd").alias("date_key"),
        F.hour(ts).alias("hour"),
        choice(s, "dev", schemas.DEVICE_TYPES, gid).alias("device_type"),
        geo.alias("geo_region"),
        choice(s, "country", COUNTRIES, gid).alias("geo_country"),
        choice(s, "city", CITIES, gid).alias("geo_city"),
        choice(s, "browser", schemas.BROWSERS, gid).alias("browser"),
        choice(s, "os", schemas.OSES, gid).alias("os"),
        choice(s, "pos", schemas.AD_POSITIONS, gid).alias("ad_position"),
        (u01(s, "view", gid) < 0.8).alias("viewable"),
        F.round(uniform(s, "icost", 0.001, 0.05, gid), 4).alias("cost_usd"),
        F.format_string("PUB-%04d", uniform_int(s, "pub", 1, 500, gid)).alias("publisher_id"),
        F.format_string("PLC-%05d", uniform_int(s, "plc", 1, 2000, gid)).alias("placement_id"),
    )


def generate_clicks(impressions: DataFrame, cfg: GeneratorConfig) -> DataFrame:
    """Click fact (`02:136-167`): Bernoulli thinning of impressions at
    ``click_rate`` (P9), ts = impression ts + U[1,30]s (`02:147`),
    device/geo inherited (`02:155-157`)."""
    s = cfg.seed
    imp_id = F.col("impression_id")
    sampled = impressions.filter(u01(s, "click", imp_id) < cfg.click_rate)
    # Unique click id derived from the parent impression's numeric id —
    # collision-free by construction (vs. a hash id, which would collide
    # at billions of rows) and needs no global row_number shuffle.
    imp_no = F.regexp_extract(imp_id, r"(\d+)", 1).cast("long")
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.to_timestamp("timestamp"))
        + uniform_int(s, "cdelay", 1, 30, imp_id).cast("long")
    )
    return sampled.select(
        F.format_string("CLK-%010d", imp_no).alias("click_id"),
        imp_id,
        F.col("campaign_id"),
        _iso(ts).alias("timestamp"),
        F.date_format(ts, "yyyy-MM-dd").alias("date_key"),
        F.col("device_type"),
        F.col("geo_region"),
        F.col("geo_country"),
        F.concat(F.lit("https://example.com/landing/"), F.lower(F.hex(_h(s, "lp", imp_id)))).alias(
            "landing_page_url"
        ),
        F.when(
            u01(s, "ref", imp_id) < 0.3, F.lit(None).cast("string")
        ).otherwise(F.concat(F.lit("https://referrer.example/"), F.lower(F.hex(_h(s, "rf", imp_id)))))
        .alias("referrer_url"),
        uniform_int(s, "tos", 1, 600, imp_id).alias("time_on_site_seconds"),
        uniform_int(s, "pages", 1, 15, imp_id).alias("pages_viewed"),
        (u01(s, "bounce", imp_id) < 0.4).alias("bounce"),
        F.round(uniform(s, "ccost", 0.10, 2.00, imp_id), 4).alias("cost_usd"),
    )


def generate_conversions(
    clicks: DataFrame, campaigns: DataFrame, cfg: GeneratorConfig
) -> DataFrame:
    """Conversion fact (`02:170-220`): thinning of clicks at
    ``conversion_rate``, delay ≤ 7 days (`02:190-194`), revenue =
    campaign CPA × U[0.5, 5.0] via broadcast dim join (J9; `02:197-198`)."""
    s = cfg.seed
    clk = F.col("click_id")
    sampled = clicks.filter(u01(s, "conv", clk) < cfg.conversion_rate)
    cpa = campaigns.select("campaign_id", "target_cpa_usd")
    joined = sampled.join(F.broadcast(cpa), "campaign_id")
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.to_timestamp("timestamp"))
        + uniform_int(s, "vdelay", 60, 7 * 24 * 3600, clk).cast("long")
    )
    clk_no = F.regexp_extract(clk, r"(\d+)", 1).cast("long")
    return joined.select(
        F.format_string("CNV-%010d", clk_no).alias("conversion_id"),
        clk,
        F.col("impression_id"),
        F.col("campaign_id"),
        _iso(ts).alias("timestamp"),
        F.date_format(ts, "yyyy-MM-dd").alias("date_key"),
        choice(s, "ctype", schemas.CONVERSION_TYPES, clk).alias("conversion_type"),
        F.round(F.col("target_cpa_usd") * uniform(s, "rev", 0.5, 5.0, clk), 2).alias(
            "revenue_usd"
        ),
        uniform_int(s, "qty", 1, 5, clk).alias("quantity"),
        F.lit("USD").alias("currency"),
        F.concat(F.lit("ORD-"), F.substring(F.md5(clk), 1, 8)).alias("order_id"),
        choice(s, "pcat", schemas.PRODUCT_CATEGORIES, clk).alias("product_category"),
        (u01(s, "newc", clk) < 0.4).alias("new_customer"),
        F.col("device_type"),
        F.col("geo_region"),
        choice(s, "attr", schemas.ATTRIBUTION_MODELS, clk).alias("attribution_model"),
    )


def generate_all(spark: SparkSession, cfg: GeneratorConfig | None = None) -> dict[str, DataFrame]:
    """Full star schema with referential integrity by construction."""
    cfg = cfg or GeneratorConfig()
    campaigns = generate_campaigns(spark, cfg)
    impressions = generate_impressions(spark, campaigns, cfg)
    clicks = generate_clicks(impressions, cfg)
    conversions = generate_conversions(clicks, campaigns, cfg)
    return {
        "campaigns": campaigns,
        "impressions": impressions,
        "clicks": clicks,
        "conversions": conversions,
    }
