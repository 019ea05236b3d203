"""Seasonal anomaly flags — composition of the two certified halves
(`timeseries.seasonal_baseline` → `quality.mad_outliers` over the
residuals): a value is anomalous only vs its own hour-of-week slot
history, and the threshold is the robust median/MAD of the residual
distribution per event type. ROUND-7 BANK."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.quality import mad_outliers
from yougile_etl_pipeline_spark.operators.timeseries import (
    seasonal_baseline,
)
from yougile_etl_pipeline_spark.sources.tables import load_table

# the proven seasonal fragment (registry_r06 `events_seasonal_baseline`)
# feeding the proven MAD fragment (tests/test_robust_stats.py), with
# the residual as the scored value
_ORACLE = """
WITH keyed AS (
  SELECT event_id, event_type, value,
         dayofweek(ts) + 1 AS dow, hour(ts) AS hod
  FROM events),
prof AS (
  SELECT event_type, dow, hod,
         CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS baseline_mean
  FROM keyed WHERE value IS NOT NULL
  GROUP BY 1, 2, 3),
resid AS (
  SELECT k.event_id, k.event_type, k.value, p.baseline_mean,
         k.value - p.baseline_mean AS baseline_residual
  FROM keyed k
  JOIN prof p USING (event_type, dow, hod)
  WHERE k.value IS NOT NULL),
r1 AS (
  SELECT event_type, baseline_residual,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY baseline_residual) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM resid),
med AS (
  SELECT event_type, SUM(baseline_residual) / COUNT(*) AS median
  FROM r1 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1),
base AS (
  SELECT v.event_id, v.event_type, v.value, v.baseline_mean,
         v.baseline_residual, m.median,
         abs(v.baseline_residual - m.median) AS abs_dev
  FROM resid v JOIN med m USING (event_type)),
r2 AS (
  SELECT event_type, abs_dev,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs_dev) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM base),
mad AS (
  SELECT event_type, SUM(abs_dev) / COUNT(*) AS mad
  FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1)
SELECT b.event_id, b.event_type, b.value, b.baseline_mean,
       b.baseline_residual, b.median, d.mad,
       (b.baseline_residual - b.median) / d.mad AS robust_z
FROM base b JOIN mad d USING (event_type)
WHERE d.mad > 0 AND b.abs_dev > 3.0 * d.mad
"""


def build(spark, sf):
    ev = load_table(spark, sf, "events") \
        .select("event_id", "event_type", "ts", "value")
    resid = (seasonal_baseline(ev, "ts", "value",
                               group_cols=["event_type"])
             .select("event_id", "event_type", "value",
                     "baseline_mean", "baseline_residual"))
    return (mad_outliers(resid, "event_type", "baseline_residual",
                         k=3.0)
            .filter("is_outlier")
            .select("event_id", "event_type", "value", "baseline_mean",
                    "baseline_residual", "median", "mad", "robust_z"))


def test_seasonal_anomalies_duckdb_parity(spark):
    got = build(spark, SF_SMOKE)
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, _ORACLE)
    assert not issues, issues
    assert got.count() > 0, "fixture produced no anomalies — weak test"
