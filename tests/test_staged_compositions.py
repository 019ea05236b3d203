"""Two staged round-6 composition queries, oracles proven BEFORE
registration:

* `sample_stratified_exact` — exactly-n-per-stratum deterministic
  subsample (md5-rank order): the balanced-subsampling counterpart of
  the rate-based `deterministic_sample` (which guarantees a FRACTION;
  this guarantees a COUNT per stratum — the "cap every language at n
  docs" training-mix op). One shuffle on the stratum; rank by the
  uniform md5 so the pick is unbiased-by-construction and identical
  on any engine/partitioning.
* `events_step_latency` — per event-type transition, the EXACT median
  inter-event gap (microsecond-exact lead() pairs composed with the
  exact_group_median machinery): the funnel-latency report.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.quality import exact_group_median
from yougile_etl_pipeline_spark.sources.tables import load_table

N_PER_STRATUM = 20


def stratified_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    return (docs.withColumn("pick_rank",
                            F.row_number().over(w).cast("long"))
                .filter(F.col("pick_rank") <= N_PER_STRATUM)
                .select("doc_id", "lang", "pick_rank"))


_STRAT_ORACLE = f"""
SELECT doc_id, lang, pick_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS pick_rank
  FROM documents)
WHERE pick_rank <= {N_PER_STRATUM}
"""


def test_stratified_exact_duckdb_parity(spark):
    got = stratified_query(spark, SF_SMOKE)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _STRAT_ORACLE) == []


def test_stratified_counts_are_exact_per_stratum(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    avail = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
    got = {r["lang"]: r["n"] for r in
           stratified_query(spark, SF_SMOKE)
           .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {lang: min(n, N_PER_STRATUM)
                   for lang, n in avail.items()}


def latency_query(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros(F.lead("ts").over(w))
         - F.unix_micros("ts")).alias("gap_us"))
        .filter(F.col("next_type").isNotNull())
        .withColumn("step", F.concat_ws("->", "event_type", "next_type")))
    med = exact_group_median(pairs, "step", "gap_us", "median_gap_us")
    counts = pairs.groupBy("step").agg(
        F.count(F.lit(1)).alias("n_transitions"))
    return counts.join(med, "step")


_LAT_ORACLE = """
WITH pairs AS (
  SELECT event_type || '->' || lead(event_type) OVER w AS step,
         epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (SELECT step, gap_us FROM pairs WHERE step IS NOT NULL),
r AS (
  SELECT step, gap_us,
         row_number() OVER (PARTITION BY step ORDER BY gap_us) AS rn,
         count(*) OVER (PARTITION BY step) AS n
  FROM p),
med AS (
  SELECT step, SUM(gap_us) / COUNT(*) AS median_gap_us
  FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1),
counts AS (SELECT step, count(*) AS n_transitions FROM p GROUP BY 1)
SELECT c.step, c.n_transitions, m.median_gap_us
FROM counts c JOIN med m USING (step)
"""


def test_step_latency_duckdb_parity(spark):
    got = latency_query(spark, SF_SMOKE)
    con = duck_connect(SF_SMOKE)
    assert compare(got, con, _LAT_ORACLE) == []
    assert got.count() > 0
