"""Round-14 query registrations — STAGING BANK, NOT YET WIRED.

Do NOT import this module in round 13: the r13 certification window is
exactly full (the ten registry_r13 bank entries, the three ADVICE-r12
planned-change holds, and the held-out r05/r06-era recertification
fillers, with mid-round registrations swapping fillers back
one-for-one), and registering past the driver's 50-slot window would
leave never-certified queries at the round boundary
(tests/test_certification_window.py enforces the accounting). At
ROUND-14 START, wire it with one line at the bottom of
registry_ext.py next to the registry_r06–r13 imports.

Same staging contract as the previous banks: every entry lands here
only with its DuckDB oracle proven bit-identical at sf0.001 AND
sf0.01 (scripts/check_staged.py) and a recorded sf0.1 wall time
(bench.py's `staged` block is manifest-driven off R14_ENTRIES —
automatic once the entry and its parity test exist).

tests/test_registry_r14_staged.py smoke-imports this module in a
SUBPROCESS (so the round-13 window stays untouched) and verifies every
entry registers with an oracle and runs green at sf0.001.

BEFORE designing any new entry, grep the registry for the name AND
the feature — @register silently overwrites an existing name in
place (the r12 near-miss: agg_grouping_sets / win_dist_functions
already existed from r05).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.registry import register
from yougile_etl_pipeline_spark.sources.tables import load_table


@register("mm_png_gray_resize_nearest", """
WITH p AS (SELECT event_id AS id,
                  6 + event_id % 5 AS w, 3 + event_id % 3 AS h
           FROM events),
v AS (SELECT id, w, h,
  list_transform(range(0, 48), k ->
    (id + 13 * (((k // 8) * h) // 6)
        + 7 * (((k % 8) * w) // 8)) % 256) AS px
  FROM p)
SELECT id AS media_id,
       CAST(w AS INTEGER) AS src_w, CAST(h AS INTEGER) AS src_h,
       CAST(list_sum(px) AS BIGINT) AS out_sum,
       CAST(list_min(px) AS INTEGER) AS out_min,
       CAST(list_max(px) AS INTEGER) AS out_max
FROM v
""")
def mm_png_gray_resize_nearest(spark, sf):
    # Grayscale-PNG thumbnail preprocess under bit-exact verification:
    # the r13 color-type-0 decode (bpp=1 filter reconstruction)
    # feeding the nearest-neighbor 6x8 resize — the same
    # transform-tier certificate mm_png_resize_nearest carries for
    # truecolor, on the single-channel profile (k in range(48):
    # rr = k div 8, cc = k mod 8; src cell ((rr*h) div 6,
    # (cc*w) div 8)). Map-only mapInPandas pass.
    from yougile_etl_pipeline_spark.operators.multimodal import (
        png_resize_stats,
        synth_png_gray_payloads,
    )

    ev = load_table(spark, sf, "events").select("event_id")
    return png_resize_stats(synth_png_gray_payloads(ev, "event_id"), 6, 8)


@register("mm_png_rgba_flip_crop", """
WITH p AS (SELECT event_id AS id,
                  4 + event_id % 3 AS w, 3 + event_id % 4 AS h
           FROM events),
v AS (SELECT id, w, h,
  list_transform(range(0, 24), k ->
    (id + 11 * ((h - 2) // 2 + k // 12)
        + 5 * (w - 1 - ((w - 3) // 2 + (k % 12) // 4))
        + 3 * (k % 4)) % 256) AS px
  FROM p)
SELECT id AS media_id,
       CAST(w AS INTEGER) AS src_w, CAST(h AS INTEGER) AS src_h,
       CAST(list_sum(px) AS BIGINT) AS out_sum,
       CAST(list_min(px) AS INTEGER) AS out_min,
       CAST(list_max(px) AS INTEGER) AS out_max
FROM v
""")
def mm_png_rgba_flip_crop(spark, sf):
    # Augmentation pair (mirror + centered 2x3 crop) on the r13 RGBA
    # decode — the alpha plane rides the flip/crop index arithmetic
    # exactly like a color channel, which is what this certifies
    # (k in range(24): rr = k div 12, cc = (k mod 12) div 4,
    # ch = k mod 4; flip c' = w-1-c, crop offsets (dim-crop) div 2).
    # Map-only mapInPandas pass.
    from yougile_etl_pipeline_spark.operators.multimodal import (
        png_flip_crop_stats,
        synth_png_rgba_payloads,
    )

    ev = load_table(spark, sf, "events").select("event_id")
    return png_flip_crop_stats(
        synth_png_rgba_payloads(ev, "event_id"), 2, 3)


@register("events_km_median_latency", """
WITH RECURSIVE u AS (
  SELECT user_id, min(epoch_ms(ts)) AS first_ms,
         min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END)
           AS fp
  FROM events GROUP BY 1),
d AS (SELECT (fp - first_ms) // 3600000 AS dur
      FROM u WHERE fp IS NOT NULL
        AND (fp - first_ms) // 3600000 <= 48),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
per AS (SELECT dur, CAST(count(*) AS BIGINT) AS deaths
        FROM d GROUP BY 1),
risk AS (SELECT dur, deaths,
  (SELECT n_users FROM n)
   - CAST(COALESCE(SUM(deaths) OVER (ORDER BY dur
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
   AS at_risk
  FROM per),
r0 AS (SELECT dur, deaths, at_risk,
              row_number() OVER (ORDER BY dur) AS rn
       FROM risk),
km AS (
  SELECT rn, dur, at_risk,
         1000000000 * (at_risk - deaths) // at_risk AS s
  FROM r0 WHERE rn = 1
  UNION ALL
  SELECT nx.rn, nx.dur, nx.at_risk,
         km.s * (nx.at_risk - nx.deaths) // nx.at_risk
  FROM km JOIN r0 nx ON nx.rn = km.rn + 1),
m AS (SELECT min(dur) AS md FROM km WHERE s <= 500000000)
SELECT km.dur AS median_dur_hours, km.s AS survival_fp,
       (SELECT n_users FROM n) AS n_users
FROM km JOIN m ON km.dur = m.md
""")
def events_km_median_latency(spark, sf):
    # The KM median: the first duration where the r13
    # events_survival_km curve crosses S(t) ≤ 0.5 — the
    # censoring-correct "median time to convert" (a plain median over
    # converters only would be biased early by ignoring the censored
    # mass). Built ON the registered KM entry's output — the engine's
    # own compositionality is the point — plus one broadcast of the
    # user count; the oracle restates the recursive-CTE chain locally
    # (banks never import sibling bank modules).
    from yougile_etl_pipeline_spark.registry import QUERIES

    km = QUERIES["events_survival_km"](spark, sf)
    med = (km.filter(F.col("survival_fp") <= 500000000)
           .agg(F.min("dur").alias("md")))
    ev = load_table(spark, sf, "events").select("user_id")
    n = ev.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"))
    return (km.join(F.broadcast(med), km["dur"] == med["md"])
            .join(F.broadcast(n))
            .select(F.col("dur").alias("median_dur_hours"),
                    F.col("survival_fp"), "n_users"))


_BENFORD2_PPM = {0: 119679, 1: 113890, 2: 108821, 3: 104330,
                 4: 100308, 5: 96677, 6: 93375, 7: 90352,
                 8: 87570, 9: 84997}
_BENFORD2_CASE = ("CASE d " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD2_PPM.items()) + " END")


@register("quality_benford2_chi2_gate", f"""
WITH o AS (
  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(20,2)) * 100
              AS BIGINT) AS VARCHAR), 2, 1) AS INT) AS d
  FROM orders
  WHERE length(CAST(CAST(CAST(o_totalprice AS DECIMAL(20,2)) * 100
               AS BIGINT) AS VARCHAR)) >= 2),
oc AS (SELECT d, CAST(count(*) AS BIGINT) AS cnt FROM o GROUP BY 1),
c AS (SELECT d, obs, CAST({_BENFORD2_CASE} AS BIGINT) AS ppm FROM (
      SELECT dom.d AS d, CAST(COALESCE(oc.cnt, 0) AS BIGINT) AS obs
      FROM (SELECT CAST(range AS INT) AS d FROM range(0, 10)) dom
      LEFT JOIN oc ON dom.d = oc.d)),
t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM c),
terms AS (
  SELECT d,
    (CAST(obs * 1000000 - t.n * ppm AS DOUBLE)
     * CAST(obs * 1000000 - t.n * ppm AS DOUBLE))
    / CAST(t.n * ppm * 1000000 AS DOUBLE) AS term
  FROM c, t),
folded AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(term ORDER BY d)), (acc, x) -> acc + x) AS chi2
  FROM terms)
SELECT t.n, folded.chi2, folded.chi2 > 16.919 AS reject_benford2
FROM t, folded
""")
def quality_benford2_chi2_gate(spark, sf):
    # Second-digit Benford test — the forensic-accounting companion
    # to the r12 first-digit gate (second digits are the standard
    # screen for INVENTED numbers and psychological price points,
    # flatter but still non-uniform: P(d) = Σ_d1 log10(1+1/(10·d1+d)),
    # held as integer-ppm LITERALS so no runtime log10). All ten
    # domain cells are charged their expected-count term via the
    # literal 0–9 domain left-join (the ADVICE-r12 lesson applied
    # from birth); 16.919 is the 5%/9-df critical value; the term
    # fold is digit-ordered (the benford/EWMA device).
    o = load_table(spark, sf, "orders").select(
        F.expr("CAST(CAST(CAST(o_totalprice AS DECIMAL(20,2)) * 100 "
               "AS BIGINT) AS STRING)").alias("s"))
    o = (o.filter(F.length("s") >= 2)
         .select(F.expr("CAST(substring(s, 2, 1) AS INT)").alias("d")))
    ppm_map = F.create_map(*[F.lit(x) for kv in _BENFORD2_PPM.items()
                             for x in kv])
    dom = spark.range(0, 10).select(F.col("id").cast("int").alias("d"))
    counts = (dom.join(o.groupBy("d").agg(
                  F.count(F.lit(1)).alias("cnt")), "d", "left")
              .select("d",
                      F.coalesce(F.col("cnt"), F.lit(0))
                      .cast("bigint").alias("obs"))
              .withColumn("ppm", ppm_map[F.col("d")].cast("bigint")))
    term = ("(CAST(obs * 1000000 - n * ppm AS DOUBLE) "
            "* CAST(obs * 1000000 - n * ppm AS DOUBLE)) "
            "/ CAST(n * ppm * 1000000 AS DOUBLE)")
    tot = counts.agg(F.sum("obs").cast("bigint").alias("n"),
                     F.sort_array(F.collect_list(
                         F.struct("d", "obs", "ppm"))).alias("rows"))
    per = (tot.select("n", F.explode("rows").alias("r"))
           .select("n", F.col("r.d").alias("d"),
                   F.col("r.obs").alias("obs"),
                   F.col("r.ppm").alias("ppm"))
           .withColumn("term", F.expr(term)))
    folded = (per.groupBy("n")
              .agg(F.sort_array(F.collect_list(
                  F.struct("d", "term"))).alias("ts"))
              .select("n", F.expr(
                  "aggregate(ts, CAST(0.0 AS DOUBLE), "
                  "(acc, t) -> acc + t.term)").alias("chi2")))
    return folded.select(
        "n", "chi2", (F.col("chi2") > 16.919).alias("reject_benford2"))


@register("agg_skewness_kurtosis", """
WITH b AS (SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q
           FROM lineitem),
s AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(q) AS BIGINT) AS s1,
        CAST(SUM(q * q) AS BIGINT) AS s2,
        CAST(SUM(q * q * q) AS BIGINT) AS s3,
        CAST(SUM(q * q * q * q) AS BIGINT) AS s4
      FROM b GROUP BY 1),
r AS (SELECT flag, n, s1, s2, s3, s4,
        CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      FROM s),
m AS (SELECT flag, n, s1, s2, s3, s4,
        r2 - mean * mean AS m2,
        r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean AS m3,
        r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
           - 3.0 * mean * mean * mean * mean AS m4
      FROM r)
SELECT flag, n, s1, s2, s3, s4,
       m3 / (m2 * sqrt(m2)) AS skewness,
       m4 / (m2 * m2) - 3.0 AS kurtosis_excess
FROM m
""")
def agg_skewness_kurtosis(spark, sf):
    # Exact third/fourth central moments per return flag from BIGINT
    # raw-moment sufficient statistics (q ≤ 50 keeps Σq⁴ under int64
    # through ~10^12 rows): the distribution-shape profile
    # (skewness, excess kurtosis) that the mean/median/percentile
    # entries cannot see. Every double materializes through the SAME
    # staged expressions in both engines — one division per raw
    # moment, then the central-moment polynomials, then
    # m3/(m2·sqrt(m2)) and m4/m2² − 3 (sqrt is IEEE-exact, so the
    # doubles hash-pair). Single flag-keyed aggregate, map-side
    # combined; the moment algebra runs on the |flags|-row relation.
    b = load_table(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("q"))
    s = b.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("s1"),
        F.sum(F.expr("q * q")).cast("bigint").alias("s2"),
        F.sum(F.expr("q * q * q")).cast("bigint").alias("s3"),
        F.sum(F.expr("q * q * q * q")).cast("bigint").alias("s4"))
    r = s.select(
        "flag", "n", "s1", "s2", "s3", "s4",
        F.expr("CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)").alias("mean"),
        F.expr("CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)").alias("r2"),
        F.expr("CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)").alias("r3"),
        F.expr("CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)").alias("r4"))
    m = r.select(
        "flag", "n", "s1", "s2", "s3", "s4",
        F.expr("r2 - mean * mean").alias("m2"),
        F.expr("r3 - 3.0D * mean * r2 + 2.0D * mean * mean * mean")
        .alias("m3"),
        F.expr("r4 - 4.0D * mean * r3 + 6.0D * mean * mean * r2 "
               "- 3.0D * mean * mean * mean * mean").alias("m4"))
    return m.select(
        "flag", "n", "s1", "s2", "s3", "s4",
        F.expr("m3 / (m2 * sqrt(m2))").alias("skewness"),
        F.expr("m4 / (m2 * m2) - 3.0D").alias("kurtosis_excess"))


# Order-independence guard (same as the other registry_* modules): if
# this module was the process's entry point into the engine, re-run
# the rotation so the certification-window SET is import-order
# -independent.
from yougile_etl_pipeline_spark import registry as _registry_mod  # noqa: E402

if hasattr(_registry_mod, "_rotate_certification_window"):
    _registry_mod._rotate_certification_window()


# Accumulates through round 13; every name must be oracle-proven at
# BOTH certification scales before it lands here (the r06–r13 staging
# discipline). Pinned by tests/test_registry_r14_staged.py and
# consumed by bench.py's `staged` block so every bank entry carries a
# wall time + plan fingerprint before it ever certifies.
R14_ENTRIES: list[str] = [
    "mm_png_gray_resize_nearest",
    "mm_png_rgba_flip_crop",
    "events_km_median_latency",
    "quality_benford2_chi2_gate",
    "agg_skewness_kurtosis",
]
