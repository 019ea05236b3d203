"""Round-7 query registrations — STAGED IN ROUND 6, NOT YET WIRED.

Do NOT import this module in round 6: the r06 certification window is
exactly full (47 round-6 registrations + 3 recertification fillers),
and registering past the driver's 50-slot window would leave
never-certified queries at the round boundary
(tests/test_certification_window.py enforces the accounting). At
ROUND-7 START, wire it with one line at the bottom of registry_ext.py
next to the registry_r06 import (NOT in registry.py — these entries
reuse registry_ext SQL-fragment conventions and the ext-bottom
position is the one that survives every circular entry path; see the
note above that import):

    from yougile_etl_pipeline_spark import registry_r07  # noqa

Every oracle below is the exact SQL proven bit-identical against the
engine in its staged test (file named per entry) at BOTH sf0.001 and
the driver's certification scale sf0.01 (`scripts/check_staged.py`).
The engine sides are the same operator calls the tests exercise. Same
determinism contract as registry.py's module docstring; one new rule
learned staging these (SCALE.md §Determinism): wide-decimal→double
casts in oracles go through VARCHAR because DuckDB's direct cast
double-rounds past 2^53.

tests/test_registry_r07_staged.py smoke-imports this module in a
SUBPROCESS (so the round-6 window stays untouched) and verifies every
entry registers with an oracle and runs green at sf0.001.
"""

from __future__ import annotations

from yougile_etl_pipeline_spark.registry import register
from yougile_etl_pipeline_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Real-codec media statistics (tests/test_media_codec.py) — the
# encode → container → decode proof: the engine decodes BYTES it built
# through the real RIFF/BMP layouts, the oracle evaluates the
# closed-form signal the payloads were synthesized from. Equality
# proves the codec, not just the plumbing.
# ---------------------------------------------------------------------------

@register("mm_wav_stats", """
SELECT event_id AS media_id,
  CAST(1 AS INTEGER) AS channels,
  CAST(8000 + (event_id % 8) * 1000 AS INTEGER) AS sample_rate,
  CAST(50 + event_id % 100 AS BIGINT) AS n_frames,
  CAST(list_sum(list_transform(range(0, CAST(50 + event_id % 100 AS BIGINT)),
       i -> ((event_id*31 + i*17) % 65536 - 32768)
          * ((event_id*31 + i*17) % 65536 - 32768))) AS BIGINT) AS sum_sq,
  CAST(list_min(list_transform(range(0, CAST(50 + event_id % 100 AS BIGINT)),
       i -> (event_id*31 + i*17) % 65536 - 32768)) AS INTEGER) AS s_min,
  CAST(list_max(list_transform(range(0, CAST(50 + event_id % 100 AS BIGINT)),
       i -> (event_id*31 + i*17) % 65536 - 32768)) AS INTEGER) AS s_max
FROM events
""")
def mm_wav_stats(spark, sf):
    from yougile_etl_pipeline_spark.operators.multimodal import (
        synth_wav_payloads,
        wav_stats,
    )

    ev = load_table(spark, sf, "events").select("event_id")
    return wav_stats(synth_wav_payloads(ev, "event_id"))


@register("mm_bmp_stats", """
SELECT p_partkey AS media_id,
  CAST(4 + p_partkey % 5 AS INTEGER) AS width,
  CAST(3 + p_partkey % 4 AS INTEGER) AS height,
  CAST(list_sum(list_transform(
       range(0, CAST((3 + p_partkey % 4) * (4 + p_partkey % 5) * 3
                     AS BIGINT)),
       i -> (p_partkey
             + 7 * (i // ((4 + p_partkey % 5) * 3))
             + 3 * ((i % ((4 + p_partkey % 5) * 3)) // 3)
             + (i % 3)) % 256)) AS BIGINT) AS px_sum,
  CAST(list_min(list_transform(
       range(0, CAST((3 + p_partkey % 4) * (4 + p_partkey % 5) * 3
                     AS BIGINT)),
       i -> (p_partkey
             + 7 * (i // ((4 + p_partkey % 5) * 3))
             + 3 * ((i % ((4 + p_partkey % 5) * 3)) // 3)
             + (i % 3)) % 256)) AS INTEGER) AS px_min,
  CAST(list_max(list_transform(
       range(0, CAST((3 + p_partkey % 4) * (4 + p_partkey % 5) * 3
                     AS BIGINT)),
       i -> (p_partkey
             + 7 * (i // ((4 + p_partkey % 5) * 3))
             + 3 * ((i % ((4 + p_partkey % 5) * 3)) // 3)
             + (i % 3)) % 256)) AS INTEGER) AS px_max
FROM part
""")
def mm_bmp_stats(spark, sf):
    from yougile_etl_pipeline_spark.operators.multimodal import (
        bmp_stats,
        synth_bmp_payloads,
    )

    parts = load_table(spark, sf, "part").select("p_partkey")
    return bmp_stats(synth_bmp_payloads(parts, "p_partkey"))


# ---------------------------------------------------------------------------
# Concentration + drift analytics (tests/test_gini_ks.py)
# ---------------------------------------------------------------------------

@register("quality_gini", """
WITH vals AS (
  SELECT o_orderpriority AS grp,
         CAST(o_totalprice AS DECIMAL(24,6)) AS x
  FROM orders WHERE o_totalprice IS NOT NULL),
ranked AS (
  SELECT grp, x,
         CAST(row_number() OVER (PARTITION BY grp ORDER BY x)
              AS BIGINT) AS i
  FROM vals),
agg AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         SUM(x) AS s, SUM(i * x) AS s1
  FROM ranked GROUP BY 1)
SELECT grp AS o_orderpriority, n,
       CAST(CAST(s AS VARCHAR) AS DOUBLE) AS total,
       CASE WHEN n * s <> 0
            THEN CAST(CAST(2 * s1 - (n + 1) * s AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(n * s AS VARCHAR) AS DOUBLE)
       END AS gini
FROM agg
""")
def quality_gini(spark, sf):
    from yougile_etl_pipeline_spark.operators.quality import gini_by_group

    return gini_by_group(load_table(spark, sf, "orders"),
                         "o_orderpriority", "o_totalprice")


@register("events_ks_global", """
WITH vals AS (
  SELECT event_type AS grp, value AS v
  FROM events WHERE value IS NOT NULL),
points AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt_all FROM vals GROUP BY 1),
gcnt AS (
  SELECT grp, v, CAST(count(*) AS BIGINT) AS cnt_g
  FROM vals GROUP BY 1, 2),
groups AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n_group FROM vals GROUP BY 1),
total AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM vals),
grid AS (
  SELECT g.grp, g.n_group, t.n_total, p.v, p.cnt_all,
         COALESCE(c.cnt_g, 0) AS cg
  FROM groups g CROSS JOIN total t CROSS JOIN points p
  LEFT JOIN gcnt c ON c.grp = g.grp AND c.v = p.v),
cdf AS (
  SELECT grp, n_group, n_total,
         SUM(cg) OVER (PARTITION BY grp ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum_g,
         SUM(cnt_all) OVER (PARTITION BY grp ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum_all
  FROM grid)
SELECT grp AS event_type, n_group, n_total,
       MAX(ABS(CAST(cum_g AS DOUBLE) / n_group
               - CAST(cum_all AS DOUBLE) / n_total)) AS ks_d
FROM cdf GROUP BY 1, 2, 3
""")
def events_ks_global(spark, sf):
    from yougile_etl_pipeline_spark.operators.quality import ks_by_group

    return ks_by_group(load_table(spark, sf, "events"),
                       "event_type", "value")


# ---------------------------------------------------------------------------
# Corpus routing + tokenizer economics (tests/test_code_fertility.py)
# ---------------------------------------------------------------------------

@register("text_code_profile", """
WITH counts AS (
  SELECT doc_id,
         CAST(length(text) AS INTEGER) AS n_chars,
         CAST(length(text) - length(regexp_replace(
              text, '[^A-Za-z0-9 ]', '', 'g')) AS INTEGER) AS n_symbols,
         CAST(length(text) - length(regexp_replace(
              text, '[{}();=<>\\[\\]]', '', 'g')) AS INTEGER)
           AS n_code_punct
  FROM documents)
SELECT doc_id, n_chars, n_symbols, n_code_punct,
       CASE WHEN n_chars > 0
            THEN CAST(n_symbols AS BIGINT) * 1000000 // n_chars
            ELSE 0 END AS symbol_ppm,
       CASE WHEN n_chars > 0
            THEN CAST(n_code_punct AS BIGINT) * 1000000 // n_chars
            ELSE 0 END AS code_punct_ppm,
       (CASE WHEN n_chars > 0
             THEN CAST(n_symbols AS BIGINT) * 1000000 // n_chars
             ELSE 0 END) >= 20000 AS is_code_like
FROM counts
""")
def text_code_profile(spark, sf):
    from yougile_etl_pipeline_spark.operators.text import code_prose_profile

    return code_prose_profile(load_table(spark, sf, "documents"))


@register("text_bpe_fertility", """
WITH per_doc AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(len(regexp_extract_all(
              text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe
  FROM documents),
agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         SUM(n_tok) AS total_tokens, SUM(n_bpe) AS total_bpe_tokens
  FROM per_doc GROUP BY 1)
SELECT lang, n_docs,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       CAST(total_bpe_tokens AS BIGINT) AS total_bpe_tokens,
       CASE WHEN total_tokens > 0
            THEN CAST(total_bpe_tokens AS DOUBLE)
                 / CAST(total_tokens AS DOUBLE)
       END AS fertility
FROM agg
""")
def text_bpe_fertility(spark, sf):
    from yougile_etl_pipeline_spark.operators.text import (
        bpe_fertility_by_lang,
    )

    return bpe_fertility_by_lang(load_table(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# BFS layers (tests/test_bfs_layers.py) — same modular graph as the
# other iterative graph entries, seeds = multiples of 10
# ---------------------------------------------------------------------------

@register("graph_bfs_layers", """
WITH d0 AS (
  SELECT DISTINCT doc_id % 40 AS x, (doc_id * 7 + 3) % 40 AS y
  FROM documents WHERE doc_id % 40 <> (doc_id * 7 + 3) % 40),
e0 AS (SELECT x AS a, y AS b FROM d0 UNION SELECT y, x FROM d0),
l0 AS (SELECT DISTINCT doc_id % 40 AS node FROM documents
       WHERE (doc_id % 40) % 10 = 0),
l1 AS (
  SELECT DISTINCT e0.b AS node FROM e0 JOIN l0 ON e0.a = l0.node
  WHERE e0.b NOT IN (SELECT node FROM l0)),
l2 AS (
  SELECT DISTINCT e0.b AS node FROM e0 JOIN l1 ON e0.a = l1.node
  WHERE e0.b NOT IN (SELECT node FROM l0)
    AND e0.b NOT IN (SELECT node FROM l1)),
l3 AS (
  SELECT DISTINCT e0.b AS node FROM e0 JOIN l2 ON e0.a = l2.node
  WHERE e0.b NOT IN (SELECT node FROM l0)
    AND e0.b NOT IN (SELECT node FROM l1)
    AND e0.b NOT IN (SELECT node FROM l2))
SELECT node, 0 AS layer FROM l0
UNION ALL SELECT node, 1 FROM l1
UNION ALL SELECT node, 2 FROM l2
UNION ALL SELECT node, 3 FROM l3
""")
def graph_bfs_layers(spark, sf):
    from pyspark.sql import functions as F

    from yougile_etl_pipeline_spark.operators.graph import bfs_layers

    d = load_table(spark, sf, "documents")
    edges = d.select((F.col("doc_id") % 40).alias("src"),
                     ((F.col("doc_id") * 7 + 3) % 40).alias("dst"))
    seeds = d.select((F.col("doc_id") % 40).alias("node")) \
             .filter(F.col("node") % 10 == 0)
    return bfs_layers(edges, seeds, rounds=3)


# ---------------------------------------------------------------------------
# Streaming exact dedup (tests/test_stream_dedup.py) — oracle-paired,
# not rows-only: the key projection of dropDuplicatesWithinWatermark
# under an availableNow drain is deterministic (see the operator
# docstring for why the full surviving rows are not).
# ---------------------------------------------------------------------------

@register("stream_dedup_keys",
          "SELECT DISTINCT user_id, event_type FROM events")
def stream_dedup_keys(spark, sf):
    from yougile_etl_pipeline_spark.streaming.snapshot import (
        run_dedup_keys_available_now,
    )

    return run_dedup_keys_available_now(
        spark, sf, table_name="stream_dedup_reg")


# ---------------------------------------------------------------------------
# decode_media itself over a MIXED corpus (tests/test_media_codec.py::
# test_decode_media_mixed_duckdb_parity) — certifies the default
# magic-dispatched decoder, i.e. the stub retirement, end-to-end.
# Features are integral doubles crossing the boundary as a
# comma-joined BIGINT string (float formatting differs between
# engines; exact integers do not).
# ---------------------------------------------------------------------------

@register("mm_media_features", """
SELECT event_id AS media_id,
  CAST(50 + event_id % 100 AS BIGINT) || ',' ||
  CAST(8000 + (event_id % 8) * 1000 AS BIGINT) || ',1,' ||
  CAST(CAST(list_sum(list_transform(
       range(0, CAST(50 + event_id % 100 AS BIGINT)),
       i -> ((event_id*31 + i*17) % 65536 - 32768)
          * ((event_id*31 + i*17) % 65536 - 32768))) AS BIGINT)
       AS VARCHAR) AS feature_csv,
  CAST(44 + 2 * (50 + event_id % 100) AS BIGINT) AS n_bytes
FROM events
UNION ALL
SELECT 10000000 + p_partkey AS media_id,
  CAST(4 + p_partkey % 5 AS BIGINT) || ',' ||
  CAST(3 + p_partkey % 4 AS BIGINT) || ',' ||
  CAST(3 * (4 + p_partkey % 5) * (3 + p_partkey % 4) AS BIGINT)
    || ',' ||
  CAST(CAST(list_sum(list_transform(
       range(0, CAST((3 + p_partkey % 4) * (4 + p_partkey % 5) * 3
                     AS BIGINT)),
       i -> (10000000 + p_partkey
             + 7 * (i // ((4 + p_partkey % 5) * 3))
             + 3 * ((i % ((4 + p_partkey % 5) * 3)) // 3)
             + (i % 3)) % 256)) AS BIGINT) AS VARCHAR) AS feature_csv,
  CAST(54 + (3 * (4 + p_partkey % 5)
             + (4 - (3 * (4 + p_partkey % 5)) % 4) % 4)
           * (3 + p_partkey % 4) AS BIGINT) AS n_bytes
FROM part
""")
def mm_media_features(spark, sf):
    from pyspark.sql import functions as F

    from yougile_etl_pipeline_spark.operators.multimodal import (
        decode_media,
        synth_bmp_payloads,
        synth_wav_payloads,
    )

    ev = load_table(spark, sf, "events").select("event_id")
    parts = load_table(spark, sf, "part").select("p_partkey")
    wav = synth_wav_payloads(ev, "event_id") \
        .withColumn("media_type", F.lit("audio"))
    bmp = synth_bmp_payloads(
        parts.select((F.col("p_partkey") + 10_000_000)
                     .alias("media_id")), "media_id") \
        .withColumn("media_type", F.lit("image"))
    feats = decode_media(wav.unionByName(bmp))
    return feats.select(
        "media_id",
        F.concat_ws(",", F.transform(
            "feature", lambda x: x.cast("bigint").cast("string")))
         .alias("feature_csv"),
        "n_bytes")


# ---------------------------------------------------------------------------
# Map-typed column functions (tests/test_map_functions.py) — the one
# function family the registered surface didn't touch. The engine
# routes every output THROUGH map operations; the oracle computes the
# same values from plain column arithmetic (maps are engine-internal,
# semantics are what's checked).
# ---------------------------------------------------------------------------

@register("f_map_functions", """
SELECT event_id,
  CASE WHEN event_id % 2 = 0 AND user_id % 2 = 0 THEN 'eid,uid'
       WHEN event_id % 2 = 0 THEN 'eid'
       WHEN user_id % 2 = 0 THEN 'uid'
       ELSE '' END AS even_keys_csv,
  CAST(event_id + user_id AS BIGINT) AS vals_sum,
  CAST(user_id AS BIGINT) AS uid_lookup,
  CAST(event_id * 2 AS BIGINT) AS eid_doubled,
  CAST(3 AS INTEGER) AS merged_size,
  'eid=' || CAST(event_id AS BIGINT) || ';uid=' ||
    CAST(user_id AS BIGINT) AS entries_csv
FROM events
""")
def f_map_functions(spark, sf):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf, "events").select("event_id", "user_id")
    m = F.create_map(
        F.lit("eid"), F.col("event_id").cast("bigint"),
        F.lit("uid"), F.col("user_id").cast("bigint"))
    even = F.map_filter(m, lambda k, v: v % 2 == 0)
    doubled = F.transform_values(m, lambda k, v: v * 2)
    merged = F.map_concat(m, F.create_map(F.lit("extra"),
                                          F.lit(7).cast("bigint")))
    entries = F.transform(
        F.sort_array(F.map_entries(m)),
        lambda e: F.concat(e["key"], F.lit("="),
                           e["value"].cast("string")))
    return ev.select(
        "event_id",
        F.concat_ws(",", F.sort_array(F.map_keys(even)))
         .alias("even_keys_csv"),
        F.aggregate(F.map_values(m), F.lit(0).cast("bigint"),
                    lambda acc, v: acc + v).alias("vals_sum"),
        F.element_at(m, "uid").alias("uid_lookup"),
        F.element_at(doubled, "eid").alias("eid_doubled"),
        F.size(merged).alias("merged_size"),
        F.concat_ws(";", entries).alias("entries_csv"))


# ---------------------------------------------------------------------------
# Seasonal anomaly flags (tests/test_seasonal_anomalies.py) — the
# certified halves composed: seasonal_baseline residuals scored by
# per-type median/MAD. A value is anomalous only vs its own
# hour-of-week slot history.
# ---------------------------------------------------------------------------

@register("events_seasonal_anomalies", """
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
""")
def events_seasonal_anomalies(spark, sf):
    from yougile_etl_pipeline_spark.operators.quality import mad_outliers
    from yougile_etl_pipeline_spark.operators.timeseries import (
        seasonal_baseline,
    )

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


# ---------------------------------------------------------------------------
# Pareto coverage at top-k cuts (tests/test_pareto_coverage.py) — the
# "what share of revenue do the top k parts carry" readout over the
# bucket-stitched abc_analysis ranking; wide-decimal → double goes
# through VARCHAR in the oracle per the SCALE.md round-6 gotcha.
# ---------------------------------------------------------------------------

@register("mart_pareto_coverage", """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS r
  FROM lineitem GROUP BY 1),
tot AS (SELECT SUM(r) AS t FROM rev),
ranked AS (
  SELECT l_partkey, r, t,
         SUM(r) OVER (ORDER BY r DESC, l_partkey
                      ROWS UNBOUNDED PRECEDING) AS cum,
         CAST(row_number() OVER (ORDER BY r DESC, l_partkey)
              AS BIGINT) AS rank
  FROM rev CROSS JOIN tot)
SELECT rank AS k,
       CAST(CAST(r AS VARCHAR) AS DOUBLE) AS revenue_at_k,
       CAST(CAST(cum AS VARCHAR) AS DOUBLE) AS cum_revenue,
       CAST(CAST(cum AS VARCHAR) AS DOUBLE)
         / CAST(CAST(t AS VARCHAR) AS DOUBLE) AS coverage_share
FROM ranked WHERE rank IN (10, 100, 1000)
""")
def mart_pareto_coverage(spark, sf):
    from pyspark.sql import functions as F

    from yougile_etl_pipeline_spark.operators.quality import abc_analysis

    li = load_table(spark, sf, "lineitem")
    tot = li.agg(F.sum(F.col("l_extendedprice").cast("decimal(24,6)"))
                  .cast("double").alias("__tot"))
    abc = abc_analysis(li, "l_partkey", "l_extendedprice")
    return (abc.filter(F.col("rank").isin(10, 100, 1000))
               .crossJoin(F.broadcast(tot))
               .select(F.col("rank").alias("k"),
                       F.col("revenue").alias("revenue_at_k"),
                       "cum_revenue",
                       (F.col("cum_revenue") / F.col("__tot"))
                        .alias("coverage_share")))


# Order-independence guard (same as the other registry_* modules): if
# this module was the process's entry point into the engine, re-run
# the rotation so the certification-window SET is import-order
# -independent.
from yougile_etl_pipeline_spark import registry as _registry_mod  # noqa: E402

if hasattr(_registry_mod, "_rotate_certification_window"):
    _registry_mod._rotate_certification_window()


# Manifest of this module's registrations — pinned by
# tests/test_registry_r07_staged.py and consumed by bench.py's
# `staged` block so every bank entry carries a wall time + plan
# fingerprint before it ever certifies.
R07_ENTRIES: list[str] = [
    "mm_wav_stats", "mm_bmp_stats", "quality_gini", "events_ks_global",
    "text_code_profile", "text_bpe_fertility", "graph_bfs_layers",
    "stream_dedup_keys", "mm_media_features", "f_map_functions",
    "events_seasonal_anomalies", "mart_pareto_coverage",
]
