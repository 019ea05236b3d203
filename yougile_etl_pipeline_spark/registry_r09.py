"""Round-9 query registrations — WIRED at round-9 start.

The staging history (preserved in git): authored in round 8 as a
deliberately-unimported empty bank; round 9 wired it live via the
import at registry_ext.py's bottom, next to the
registry_r06/r07/r08 imports, and tests/test_registry_r09_staged.py
now enforces the WIRED state (live import, every entry registered
with an oracle inside the driver's 50-slot certification window).

Every round-9 entry is built and registered in-round (direct
registration), each swapping one held-out recertification filler
back into _STABLE_CERTIFIED one-for-one so the window keeps exactly
50 non-stable entries (tests/test_certification_window.py enforces
the accounting). Same contract as every bank: an entry lands only
with its DuckDB oracle proven bit-identical at sf0.001 AND sf0.01
(per-op parity test + scripts/check_queries.py) and a recorded
sf0.1 wall time (bench.py's `staged` block is manifest-driven off
R09_ENTRIES — automatic once the entry and its parity test exist).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.registry import register
from yougile_etl_pipeline_spark.sources.tables import load_table


@register("sample_reservoir_per_lang", """
SELECT lang, doc_id, source FROM (
  SELECT lang, doc_id, source,
         row_number() OVER (
             PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR) || ':r09'), doc_id)
           AS rk
  FROM documents) WHERE rk <= 20
""")
def sample_reservoir_per_lang(spark, sf):
    # Deterministic per-group k-sample — the distributed reservoir a
    # training pipeline uses for eval/holdout carve-outs: k docs per
    # language, selection a pure function of doc_id (salted md5), so
    # re-runs and repartitions return the SAME sample. Runs through
    # operators/relational.py::grouped_topk, certifying the two-phase
    # top-k directly: the partition-local combiner bounds every task
    # at |langs|·k rows, no language ever funnels its whole corpus
    # through one sort task (tests/test_grouped_topk.py pins parity
    # and plan shape).
    from yougile_etl_pipeline_spark.operators.relational import (
        grouped_topk,
    )

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "lang", "source")
    keyed = docs.withColumn(
        "__ord",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":r09"))))
    return (grouped_topk(keyed, ["lang"], ["__ord", "doc_id"], 20)
            .select("lang", "doc_id", "source"))


@register("corpus_mixture_rebalance", """
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
tot AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS tot
        FROM t GROUP BY lang),
mn AS (SELECT MIN(tot) AS m FROM tot),
q AS (SELECT lang, (m * 10000) // tot AS q FROM tot, mn),
kept AS (
  SELECT t.* FROM t JOIN q USING (lang)
  WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) % 10000 < q)
SELECT lang, count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM kept GROUP BY lang
""")
def corpus_mixture_rebalance(spark, sf):
    # Data-driven mixture rebalancing (quality.py::mixture_rebalance):
    # every language downsampled to ~the smallest language's token
    # budget — the equal-mix primitive for multilingual training.
    # Rates are (min·10000) div total in BIGINT (no float division,
    # bit-identical across engines); row selection is the salted-md5
    # bucket, deterministic per doc_id. The corpus never shuffles:
    # the rate table (|langs| rows) broadcasts onto a per-row filter.
    from yougile_etl_pipeline_spark.operators.quality import (
        mixture_rebalance,
    )
    from yougile_etl_pipeline_spark.operators.text import tokens

    docs = (load_table(spark, sf, "documents")
            .select("doc_id", "lang",
                    F.size(tokens("text")).cast("bigint")
                    .alias("n_tokens")))
    kept = mixture_rebalance(docs, "lang", "n_tokens", "doc_id")
    return (kept.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens")))


@register("events_hopping_counts", """
SELECT win_start_ms, event_type, count(*) AS n
FROM (
  SELECT event_type,
         unnest(generate_series(a - 1200000, a, 600000)) AS win_start_ms
  FROM (SELECT event_type,
               epoch_ms(ts) - epoch_ms(ts) % 600000 AS a
        FROM events))
GROUP BY 1, 2
""")
def events_hopping_counts(spark, sf):
    # Hopping (sliding) windows via Spark's native F.window — 30-min
    # windows every 10 min, so each event lands in exactly three
    # windows. This is THE streaming-rollup shape (same expression
    # works under readStream + watermark); batch-certified here
    # against an explicit window-enumeration oracle. Map-side 3×
    # expansion then one keyed aggregate — no other shuffle; window
    # starts are epoch-aligned so the result is TZ-pinned by
    # _configure's UTC session (10-min slides also make every
    # whole-minute zone offset a no-op on alignment).
    e = load_table(spark, sf, "events")
    return (e.groupBy(F.window("ts", "30 minutes", "10 minutes")
                      .alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_millis(F.col("w.start")).alias("win_start_ms"),
                    "event_type", "n"))

# Order-independence guard (same as the other registry_* modules): if
# this module was the process's entry point into the engine, re-run
# the rotation so the certification-window SET is import-order
# -independent.
from yougile_etl_pipeline_spark import registry as _registry_mod  # noqa: E402

if hasattr(_registry_mod, "_rotate_certification_window"):
    _registry_mod._rotate_certification_window()


# Manifest of this module's registrations — pinned by
# tests/test_registry_r09_staged.py and consumed by bench.py's
# `staged` block so every bank entry carries a wall time + plan
# fingerprint before it ever certifies.
R09_ENTRIES: list[str] = [
    "sample_reservoir_per_lang",
    "corpus_mixture_rebalance",
    "events_hopping_counts",
]
