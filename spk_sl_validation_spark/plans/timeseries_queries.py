"""Time-series queries: calendar gap-filling and statistical outlier
flagging — the resample/quality layer of an event warehouse.

Gap-filling generates each key's calendar with ``sequence`` + explode
(rows created JVM-side, proportional to the calendar span, never a
cross join against a global calendar); the left join back to the
observed aggregate is key-collocated. Z-scores derive mean/variance
from exact DECIMAL power sums and apply one fixed double formula, so
both engines produce bit-identical scores despite float division/sqrt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spk_sl_validation_spark.plans.registry import register
from spk_sl_validation_spark.sources.readers import load_table

_SPARSE = 190.0  # value threshold that makes the daily series gappy


@register(
    "timeseries_gapfill",
    doc=(
        "calendar gap-filling (resample-to-daily): per event_type, the sparse "
        "daily aggregate is left-joined onto its own min..max day sequence so "
        "missing days appear with n=0/total=0. sequence+explode builds each "
        "key's calendar locally — no global calendar cross join"
    ),
    oracle=f"""
WITH d AS (SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM events WHERE value > {_SPARSE} GROUP BY 1, 2),
bounds AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM d GROUP BY 1),
cal AS (SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS day
        FROM bounds b)
SELECT c.event_type, c.day, coalesce(d.n, 0) AS n, coalesce(d.total, 0.0) AS total
FROM cal c LEFT JOIN d ON d.event_type = c.event_type AND d.day = c.day
""",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > _SPARSE)
    d = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    bounds = d.groupBy("event_type").agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
    )
    return cal.join(d, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )


_Z_TAU = 2.0


@register(
    "zscore_outliers",
    doc=(
        "per-group statistical outliers: |z| > 2 against the group's mean/std. "
        "Moments come from exact DECIMAL sum and sum-of-squares (one aggregate, "
        "order-independent), then one fixed double formula — bit-identical "
        "across engines; the tiny moment table broadcasts back onto the fact"
    ),
    oracle=f"""
WITH m AS (SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
       CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ss,
       COUNT(*) AS n FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, e.value,
       (e.value - m.s / m.n) / sqrt(m.ss / m.n - (m.s / m.n) * (m.s / m.n)) AS z
FROM events e JOIN m ON m.event_type = e.event_type
WHERE abs((e.value - m.s / m.n) / sqrt(m.ss / m.n - (m.s / m.n) * (m.s / m.n))) > {_Z_TAU}
""",
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    m = ev.groupBy("event_type").agg(
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("ss"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = ev.join(F.broadcast(m), "event_type")
    mean = F.col("s") / F.col("n")
    z = (F.col("value") - mean) / F.sqrt(F.col("ss") / F.col("n") - mean * mean)
    return (
        joined.select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > _Z_TAU)
    )


@register(
    "time_rollup_multigrain",
    doc=(
        "hypertable-style continuous aggregate: hour/day/month rollups of the "
        "events stream in ONE scan — each row explodes into its (grain, bucket) "
        "memberships, one grouped aggregate serves every grain (vs re-scanning "
        "per grain); decimal-exact sums"
    ),
    oracle="""
SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket_ts, event_type,
       COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day' AS grain, date_trunc('day', ts) AS bucket_ts, event_type,
       COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'month' AS grain, date_trunc('month', ts) AS bucket_ts, event_type,
       COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 2, 3
""",
)
def time_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grains = F.array(
        *[
            F.struct(F.lit(g).alias("grain"), F.date_trunc(g, "ts").alias("bucket_ts"))
            for g in ("hour", "day", "month")
        ]
    )
    return (
        ev.select(F.explode(grains).alias("g"), "event_type", "value")
        .groupBy(F.col("g.grain").alias("grain"), F.col("g.bucket_ts").alias("bucket_ts"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "window_trailing_median",
    doc=(
        "exact median over a trailing 7-row window per user (any aggregate "
        "works in a Spark window frame — percentile is exact selection + one "
        "interpolation, deterministic cross-engine): the rolling robust "
        "statistic for outlier-resistant monitoring"
    ),
    oracle="""
SELECT event_id, user_id, ts,
       quantile_cont(CAST(value AS DOUBLE), 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
FROM events
WHERE user_id < 30
""",
)
def window_trailing_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr("percentile(CAST(value AS DOUBLE), 0.5)").over(w).alias("med7"),
    )


SEASON_LAG_DAYS = 7


@register(
    "timeseries_seasonal_baseline",
    doc=(
        f"forecast-baseline evaluation: per event_type daily totals, seasonal-"
        f"naive forecast = value {SEASON_LAG_DAYS} rows back in day order, "
        "MAE/bias per type over the scored days — the sanity baseline every "
        "forecasting pipeline must beat, with exact DECIMAL error sums"
    ),
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, day, total,
         lag(total, {SEASON_LAG_DAYS}) OVER (PARTITION BY event_type ORDER BY day) AS fc
  FROM daily
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_scored,
       round(CAST(sum(abs(total - fc)) AS DOUBLE) / count(*), 6) AS mae,
       round(CAST(sum(total - fc) AS DOUBLE) / count(*), 6) AS mean_bias
FROM scored WHERE fc IS NOT NULL
GROUP BY event_type
""",
)
def timeseries_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily aggregate → per-type lag-k forecast → exact-decimal error
    sums (order-independent) → double division rounded to 6; every
    arithmetic step shared with the oracle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("total"))
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.withColumn("fc", F.lag("total", SEASON_LAG_DAYS).over(w)).filter(
        F.col("fc").isNotNull()
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.round(
            F.sum(F.abs(F.col("total") - F.col("fc"))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mae"),
        F.round(
            F.sum(F.col("total") - F.col("fc")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_bias"),
    )


_MAD_K = 1.4826  # consistency constant: MAD * k estimates sigma under normality
_MAD_TAU = 3.0


@register(
    "mad_outliers",
    doc=(
        "robust per-group outliers via median absolute deviation: "
        f"|value - median| > {_MAD_TAU} * {_MAD_K} * MAD — the "
        "contamination-resistant twin of zscore_outliers (one corrupted "
        "batch cannot drag the gate open, unlike mean/std). Two exact "
        "medians (group aggregate, then deviation aggregate), each a "
        "group-bounded relation broadcast back onto the fact"
    ),
    oracle=f"""
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, median(abs(e.value - m.med)) AS mad
  FROM events e JOIN med m ON m.event_type = e.event_type
  GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, e.value,
       round(abs(e.value - m.med) / ({_MAD_K!r} * d.mad), 6) AS robust_z
FROM events e
JOIN med m ON m.event_type = e.event_type
JOIN mad d ON d.event_type = e.event_type
WHERE d.mad > 0.0
  AND abs(e.value - m.med) > {_MAD_TAU!r} * {_MAD_K!r} * d.mad
""",
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD gate: both medians are exact interpolated percentiles
    over identical doubles, so the robust z is engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad")
    )
    joined = ev.join(F.broadcast(med), "event_type").join(F.broadcast(mad), "event_type")
    ad = F.abs(F.col("value") - F.col("med"))
    return (
        joined.filter(
            (F.col("mad") > 0.0) & (ad > F.lit(_MAD_TAU) * F.lit(_MAD_K) * F.col("mad"))
        )
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(ad / (F.lit(_MAD_K) * F.col("mad")), 6).alias("robust_z"),
        )
    )


@register(
    "time_weighted_average",
    doc=(
        "time-weighted average of an irregularly-sampled signal per user "
        "(TimescaleDB time_weight-style, LOCF weighting): each value holds "
        "until the next observation, weighted by that interval in seconds; "
        "per-row products rounded to 12 decimals and summed as exact "
        "DECIMAL(28,12) so the weighted mean is engine-identical. One lead "
        "window + one aggregate sharing the user-keyed exchange"
    ),
    oracle="""
WITH seq AS (
  SELECT user_id, value,
         CAST(date_diff('microsecond', ts,
              lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              AS DOUBLE) / 1000000.0 AS dt_s
  FROM events WHERE user_id < 200
),
w AS (
  SELECT user_id,
         CAST(round(value * dt_s, 12) AS DECIMAL(28,12)) AS wv,
         CAST(round(dt_s, 12) AS DECIMAL(28,12)) AS dt
  FROM seq WHERE dt_s IS NOT NULL
)
SELECT user_id,
       count(*) AS n_intervals,
       round(CAST(SUM(dt) AS DOUBLE), 6) AS total_seconds,
       round(CAST(SUM(wv) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE), 6) AS time_weighted_avg
FROM w
GROUP BY user_id
HAVING CAST(SUM(dt) AS DOUBLE) > 0.0
""",
)
def time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt_s = (
        (F.lead(F.unix_micros("ts")).over(w_seq) - F.unix_micros("ts")).cast("double")
        / 1000000.0
    )
    seq = ev.select("user_id", "value", dt_s.alias("dt_s")).filter(F.col("dt_s").isNotNull())
    w = seq.select(
        "user_id",
        F.round(F.col("value") * F.col("dt_s"), 12).cast("decimal(28,12)").alias("wv"),
        F.round("dt_s", 12).cast("decimal(28,12)").alias("dt"),
    )
    agg = w.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("wv").alias("swv"),
        F.sum("dt").alias("sdt"),
    )
    return (
        agg.filter(F.col("sdt").cast("double") > 0.0)
        .select(
            "user_id",
            "n_intervals",
            F.round(F.col("sdt").cast("double"), 6).alias("total_seconds"),
            F.round(
                F.col("swv").cast("double") / F.col("sdt").cast("double"), 6
            ).alias("time_weighted_avg"),
        )
    )


@register(
    "moment_stats_suite",
    doc=(
        "higher-moment statistics per event type from EXACT power sums: "
        "mean, population variance/stddev, skewness, excess kurtosis — "
        "values truncated to DECIMAL(18,2) once, then Σv/Σv²/Σv³/Σv⁴ "
        "accumulated as exact decimals (order-independent), and the moment "
        "formulas applied as one fixed double expression — engine-identical "
        "without relying on either engine's built-in skewness variant. One "
        "map-side-combined aggregate"
    ),
    oracle="""
WITH v AS (
  -- d2 is cast to DECIMAL(19,4) to force the int128 path: the exact
  -- value is what matters (Spark stages the same powers at different
  -- but equally-exact widths)
  SELECT event_type,
         CAST(value AS DECIMAL(8,2)) AS d,
         CAST(CAST(value AS DECIMAL(8,2)) * CAST(value AS DECIMAL(8,2))
              AS DECIMAL(19,4)) AS d2
  FROM events
),
s AS (
  SELECT event_type,
         count(*) AS n,
         SUM(d) AS s1,
         SUM(d2) AS s2,
         SUM(d2 * d) AS s3,
         SUM(d2 * d2) AS s4
  FROM v GROUP BY event_type
),
m AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS m1,
         CAST(s2 AS DOUBLE) / n AS m2,
         CAST(s3 AS DOUBLE) / n AS m3,
         CAST(s4 AS DOUBLE) / n AS m4
  FROM s
)
SELECT event_type, n,
       round(m1, 6) AS mean,
       round(m2 - m1 * m1, 6) AS variance,
       round(sqrt(m2 - m1 * m1), 6) AS stddev,
       round((m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1)
             / pow(sqrt(m2 - m1 * m1), 3.0), 6) AS skewness,
       round((m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1 * m1 * m1 * m1)
             / ((m2 - m1 * m1) * (m2 - m1 * m1)) - 3.0, 6) AS excess_kurtosis
FROM m
""",
)
def moment_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Stage the powers so every product stays inside the 38-digit exact
    # decimal range of BOTH engines: d is (8,2), d2 = d*d is (17,4) in
    # Spark, and d2*d2 = (35,8) — exact. The oracle stages identically
    # at (19,4)/(38,8); the WIDTHS differ but every intermediate is
    # exact, so the values (and the final doubles) are identical.
    d = F.col("value").cast("decimal(8,2)")
    v = ev.select("event_type", d.alias("d"), (d * d).alias("d2"))
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("s1"),
        F.sum("d2").alias("s2"),
        F.sum(F.col("d2") * F.col("d")).alias("s3"),
        F.sum(F.col("d2") * F.col("d2")).alias("s4"),
    )
    n = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n
    m3 = F.col("s3").cast("double") / n
    m4 = F.col("s4").cast("double") / n
    var = m2 - m1 * m1
    return s.select(
        "event_type",
        "n",
        F.round(m1, 6).alias("mean"),
        F.round(var, 6).alias("variance"),
        F.round(F.sqrt(var), 6).alias("stddev"),
        F.round(
            (m3 - F.lit(3.0) * m1 * m2 + F.lit(2.0) * m1 * m1 * m1)
            / F.pow(F.sqrt(var), F.lit(3.0)),
            6,
        ).alias("skewness"),
        F.round(
            (m4 - F.lit(4.0) * m1 * m3 + F.lit(6.0) * m1 * m1 * m2
             - F.lit(3.0) * m1 * m1 * m1 * m1)
            / (var * var)
            - F.lit(3.0),
            6,
        ).alias("excess_kurtosis"),
    )
