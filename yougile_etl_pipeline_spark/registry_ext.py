"""Extension query/oracle registry: LLM-data-pipeline operators
(SURVEY.md §2.10) — text analysis, dedup, similarity search, multimodal,
events/streaming.

Same determinism rules as registry.py. SQL oracles are generated from the
same constants (stopwords, marker lists, hyperplanes, shingle size) the
Spark operators use, so both sides are provably computing the same
function. Ops with no SQL-expressible twin (SimHash via xxhash64,
Structured Streaming) register without an oracle → the driver records a
rows-only check (documented, by design).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.operators import text as TX
from yougile_etl_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    shingle_jaccard_pairs,
    simhash_portable,
)
from yougile_etl_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    binary_metadata,
    fake_feature_extract,
)
from yougile_etl_pipeline_spark.operators.similarity import (
    brute_force_topk_np,
    hyperplane_bucket_sql,
    lsh_bucket_topk,
    lsh_bucket_topk_np,
)
from yougile_etl_pipeline_spark.registry import register
from yougile_etl_pipeline_spark.sources.tables import (
    load_table,
    table_row_count,
)

# --- SQL fragment generators (twins of the Spark-side constants) -----------

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in TX.STOPWORDS) + "]"


def _toks(expr: str = "text") -> str:
    return f"string_split({expr}, ' ')"


def _shingles_sql(expr: str = "text", n: int = 3) -> str:
    """DuckDB twin of operators.text.shingles (distinct word n-grams)."""
    toks = _toks(expr)
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')))"
    )


def _marker_count_sql(markers: list[str], expr: str = "text") -> str:
    lst = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return (f"len(list_filter({_toks(expr)}, "
            f"t -> list_contains({lst}, t)))")


# ---------------------------------------------------------------------------
# E3 Text analysis
# ---------------------------------------------------------------------------

@register("text_token_stats", f"""
SELECT doc_id,
  CAST(len({_toks()}) AS INTEGER) AS n_tokens,
  CAST(len(list_distinct({_toks()})) AS INTEGER) AS n_distinct_tokens,
  CAST(len(regexp_extract_all(text, '{TX.BPE_ISH_PATTERN}')) AS INTEGER)
    AS n_bpe_tokens,
  CAST(length(text) AS INTEGER) AS char_len,
  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len({_toks()})
    AS avg_token_len,
  CAST(len(list_filter({_toks()}, t -> list_contains({_STOP_SQL}, t)))
       AS DOUBLE) / len({_toks()}) AS stopword_ratio
FROM documents
""")
def text_token_stats(spark, sf):
    docs = load_table(spark, sf, "documents")
    return TX.token_stats(docs).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "n_bpe_tokens",
        "char_len", "avg_token_len", "stopword_ratio")


_LANG_CASE = " ".join(
    f"WHEN score_{lang} = best AND best > 0 THEN '{lang}'"
    for lang in TX.LANG_MARKERS
)

@register("text_lang_id", f"""
SELECT doc_id, lang,
  {", ".join(f"CAST(score_{lang} AS INTEGER) AS score_{lang}"
             for lang in TX.LANG_MARKERS)},
  CASE {_LANG_CASE} ELSE 'und' END AS lang_pred
FROM (
  SELECT doc_id, lang,
    {", ".join(f"{_marker_count_sql(m)} AS score_{lang}"
               for lang, m in TX.LANG_MARKERS.items())},
    greatest({", ".join(f"{_marker_count_sql(m)}"
                        for m in TX.LANG_MARKERS.values())}) AS best
  FROM documents
)
""")
def text_lang_id(spark, sf):
    docs = load_table(spark, sf, "documents")
    return TX.language_id(docs).select(
        "doc_id", "lang",
        *[f"score_{lang}" for lang in TX.LANG_MARKERS], "lang_pred")


# Shared quality-score oracle fragment — the single source of truth for
# the DuckDB twin of operators.text.quality_score; used verbatim by both
# `text_quality_score` and the `corpus_clean_pipeline` capstone so the
# two oracles cannot drift apart.
_QUALITY_SQL = f"""SELECT doc_id,
  0.4 * (CASE WHEN n_toks BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
  + 0.3 * (CASE WHEN stop_ratio BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END)
  + 0.3 * distinct_ratio AS quality
FROM (
  SELECT doc_id,
    len({_toks()}) AS n_toks,
    CAST(len(list_filter({_toks()}, t -> list_contains({_STOP_SQL}, t)))
         AS DOUBLE) / len({_toks()}) AS stop_ratio,
    CAST(len(list_distinct({_toks()})) AS DOUBLE) / len({_toks()})
      AS distinct_ratio
  FROM documents
)"""


@register("text_quality_score", f"""
{_QUALITY_SQL}
""")
def text_quality_score(spark, sf):
    docs = load_table(spark, sf, "documents")
    return TX.quality_score(docs).select("doc_id", "quality")


@register("text_fingerprints", f"""
SELECT doc_id,
  md5(lower(regexp_replace(text, ' +', ' ', 'g'))) AS fp_exact,
  list_aggregate(list_transform({_shingles_sql()}, s -> md5(s)), 'min')
    AS fp_shingle_min
FROM documents
""")
def text_fingerprints(spark, sf):
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        TX.fingerprint_exact("text").alias("fp_exact"),
        TX.fingerprint_shingle_min("text").alias("fp_shingle_min"))


def _top_frac_sql(grams: str) -> str:
    """DuckDB twin of the top-gram fraction that
    operators.text._gram_stats computes relationally (max single-gram
    count / total grams) — here as a per-row array expression, which
    DuckDB evaluates fine at oracle scale."""
    return (f"CAST(list_max(list_transform(list_distinct({grams}), "
            f"d -> len(list_filter({grams}, x -> x = d)))) AS DOUBLE) "
            f"/ len({grams})")


_BIGRAMS_SQL = (f"list_transform(range(1, greatest(len({_toks()}) - 1, 0) "
                f"+ 1), i -> array_to_string({_toks()}[i:i+1], ' '))")

# Duplicate-token ratio (1 − distinct/total tokens) — shared between the
# `text_repetition_stats` oracle and the `corpus_clean_pipeline` capstone.
_DUP_RATIO_SQL = (f"CAST(1 AS DOUBLE) "
                  f"- CAST(len(list_distinct({_toks()})) AS DOUBLE) "
                  f"/ len({_toks()})")


@register("text_repetition_stats", f"""
SELECT doc_id, n_tokens, dup_token_ratio, top_unigram_frac,
       top_bigram_frac,
       top_bigram_frac <= 0.18 AND dup_token_ratio <= 0.9 AS repetition_ok
FROM (
  SELECT doc_id,
    CAST(len({_toks()}) AS INTEGER) AS n_tokens,
    {_DUP_RATIO_SQL} AS dup_token_ratio,
    {_top_frac_sql(_toks())} AS top_unigram_frac,
    {_top_frac_sql(_BIGRAMS_SQL)} AS top_bigram_frac
  FROM documents
)
""")
def text_repetition_stats(spark, sf):
    # Gopher-style repetition filters (operators/text.py::repetition_stats)
    docs = load_table(spark, sf, "documents")
    return TX.repetition_stats(docs).select(
        "doc_id", "n_tokens", "dup_token_ratio", "top_unigram_frac",
        "top_bigram_frac", "repetition_ok")


@register("doc_chunks", f"""
SELECT doc_id,
  CAST((s - 1) // 24 AS BIGINT) AS chunk_idx,
  array_to_string(({_toks()})[s:s+31], ' ') AS chunk_text,
  CAST(least(32, len({_toks()}) - s + 1) AS INTEGER) AS chunk_tokens
FROM documents, unnest(range(1, greatest(len({_toks()}), 1) + 1, 24))
     AS t(s)
""")
def doc_chunks(spark, sf):
    # Fixed-size token windows (chunk 32, stride 24) — the map-only
    # chunking stage a training pipeline feeds to embedding/packing.
    docs = load_table(spark, sf, "documents")
    return TX.chunk_documents(docs, chunk_size=32, stride=24)


@register("text_line_dedup", f"""
WITH segs AS (
  SELECT doc_id, CAST((s-1)//8 AS BIGINT) AS seg_idx,
         array_to_string(({_toks()})[s:s+7], ' ') AS seg
  FROM documents,
       unnest(range(1, greatest(len({_toks()}), 1) + 1, 8)) AS t(s)
), freq AS (SELECT seg, count(DISTINCT doc_id) AS seg_df
            FROM segs GROUP BY seg)
SELECT doc_id,
  COALESCE(array_to_string(list(seg ORDER BY seg_idx)
             FILTER (WHERE seg_df < 2), ' '), '') AS clean_text,
  CAST(count(*) FILTER (WHERE seg_df < 2) AS BIGINT) AS n_kept,
  CAST(count(*) FILTER (WHERE seg_df >= 2) AS BIGINT) AS n_dropped
FROM segs JOIN freq USING (seg)
GROUP BY doc_id
""")
def text_line_dedup(spark, sf):
    # CCNet-style cross-document passage removal: every copy of any
    # aligned 8-token segment occurring in >= 2 distinct documents is
    # dropped, survivors reassembled in order (operators/text.py::
    # line_dedup). The segment-frequency shuffle + fingerprint join-back
    # is the line-dedup stage of a corpus cleaning pipeline; output is
    # all-scalar (clean_text string, counts) so the driver can hash it.
    docs = load_table(spark, sf, "documents")
    return TX.line_dedup(docs, seg_tokens=8, min_df=2)


@register("text_bm25_scores", f"""
WITH stats AS (
  SELECT count(*) AS n,
         SUM(len({_toks()})) AS len_sum,
         count_if(list_contains({_toks()}, 'table')) AS df0,
         count_if(list_contains({_toks()}, 'spark')) AS df1,
         count_if(list_contains({_toks()}, 'vector')) AS df2
  FROM documents
)
SELECT doc_id,
  CAST(0.0 AS DOUBLE)
  + ((s.n - s.df0 + CAST(0.5 AS DOUBLE)) / (s.df0 + CAST(0.5 AS DOUBLE)))
    * CAST(len(list_filter({_toks()}, y -> y = 'table')) AS DOUBLE)
    * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
    / (CAST(len(list_filter({_toks()}, y -> y = 'table')) AS DOUBLE)
       + CAST(1.2 AS DOUBLE)
         * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
            + CAST(0.75 AS DOUBLE) * CAST(len({_toks()}) AS DOUBLE)
              / (CAST(s.len_sum AS DOUBLE) / CAST(s.n AS DOUBLE))))
  + ((s.n - s.df1 + CAST(0.5 AS DOUBLE)) / (s.df1 + CAST(0.5 AS DOUBLE)))
    * CAST(len(list_filter({_toks()}, y -> y = 'spark')) AS DOUBLE)
    * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
    / (CAST(len(list_filter({_toks()}, y -> y = 'spark')) AS DOUBLE)
       + CAST(1.2 AS DOUBLE)
         * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
            + CAST(0.75 AS DOUBLE) * CAST(len({_toks()}) AS DOUBLE)
              / (CAST(s.len_sum AS DOUBLE) / CAST(s.n AS DOUBLE))))
  + ((s.n - s.df2 + CAST(0.5 AS DOUBLE)) / (s.df2 + CAST(0.5 AS DOUBLE)))
    * CAST(len(list_filter({_toks()}, y -> y = 'vector')) AS DOUBLE)
    * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
    / (CAST(len(list_filter({_toks()}, y -> y = 'vector')) AS DOUBLE)
       + CAST(1.2 AS DOUBLE)
         * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
            + CAST(0.75 AS DOUBLE) * CAST(len({_toks()}) AS DOUBLE)
              / (CAST(s.len_sum AS DOUBLE) / CAST(s.n AS DOUBLE))))
  AS bm25,
  CAST(CAST(list_contains({_toks()}, 'table') AS INTEGER)
     + CAST(list_contains({_toks()}, 'spark') AS INTEGER)
     + CAST(list_contains({_toks()}, 'vector') AS INTEGER) AS BIGINT)
    AS n_query_terms_present
FROM documents, stats s
""")
def text_bm25_scores(spark, sf):
    # BM25 retrieval scoring of the corpus against the literal query
    # {table, spark, vector} (operators/text.py::bm25_scores,
    # linear-idf variant — ln isn't bit-portable, its argument is).
    # Fixed-order expression-tree summation and exact-int-derived
    # floats keep the doubles bit-identical to the oracle; corpus
    # stats ride a broadcast cross join, scoring is map-only.
    docs = load_table(spark, sf, "documents")
    return TX.bm25_scores(docs, ["table", "spark", "vector"])


@register("text_self_dedup", f"""
WITH segs AS (
  SELECT doc_id, CAST((s-1)//2 AS BIGINT) AS seg_idx,
         array_to_string(({_toks()})[s:s+1], ' ') AS seg
  FROM documents,
       unnest(range(1, greatest(len({_toks()}), 1) + 1, 2)) AS t(s)
), firsts AS (
  SELECT doc_id, seg, min(seg_idx) AS first_idx
  FROM segs GROUP BY doc_id, seg
)
SELECT s.doc_id,
  COALESCE(array_to_string(list(s.seg ORDER BY s.seg_idx)
             FILTER (WHERE s.seg_idx = f.first_idx), ' '), '')
    AS clean_text,
  CAST(count(*) FILTER (WHERE s.seg_idx = f.first_idx) AS BIGINT)
    AS n_kept,
  CAST(count(*) FILTER (WHERE s.seg_idx <> f.first_idx) AS BIGINT)
    AS n_dropped
FROM segs s JOIN firsts f ON s.doc_id = f.doc_id AND s.seg = f.seg
GROUP BY s.doc_id
""")
def text_self_dedup(spark, sf):
    # Intra-document repeated-segment removal (operators/text.py::
    # self_dedup): first occurrence of each aligned 2-token segment
    # survives, later copies drop — entirely map-only HOF expressions,
    # zero shuffle (the DuckDB twin needs a group/join; the Spark side
    # does not — plan-audited). 2-token segments because the synthetic
    # corpus repeats at that granularity (246 duplicated pairs at
    # sf0.01); real corpora use 8+.
    docs = load_table(spark, sf, "documents")
    return TX.self_dedup(docs, seg_tokens=2)


@register("sample_quality_quota", f"""
WITH scored AS ({_QUALITY_SQL}),
ranked AS (
  SELECT d.doc_id, d.source, s.quality,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY s.quality DESC, d.doc_id) AS rank
  FROM documents d JOIN scored s ON d.doc_id = s.doc_id
)
SELECT doc_id, source, quality, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 50
""")
def sample_quality_quota(spark, sf):
    # Per-source quality quota ("domain cap"): every source keeps only
    # its 50 best documents by the heuristic quality score, determinisic
    # tie-break on doc_id — one shuffle on source
    # (operators/quality.py::topk_per_group). The mix-shaping step after
    # scoring and before packing: a giant crawl domain cannot drown the
    # curated sources.
    from yougile_etl_pipeline_spark.operators.quality import topk_per_group

    docs = TX.quality_score(load_table(spark, sf, "documents"))
    return topk_per_group(docs.select("doc_id", "source", "quality"),
                          "source", "quality", "doc_id", 50)


# Data-mixing rates: literal dict shared by the Spark op and the SQL
# oracle — both sides compute thresholds from the SAME source of truth.
_MIX_RATES = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}
_MIX_DEFAULT = 0.1
_MIX_CASE = ("CASE " + " ".join(
    f"WHEN source = '{g}' THEN {int(round(r * 10000))}"
    for g, r in _MIX_RATES.items())
    + f" ELSE {int(round(_MIX_DEFAULT * 10000))} END")


@register("sample_source_mix", f"""
SELECT doc_id, source FROM documents
WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 10000 < {_MIX_CASE}
""")
def sample_source_mix(spark, sf):
    # Per-source deterministic sampling (data mixing): keep 100% of src0,
    # 75/50/25% of src1-3, 10% of the long tail — auditable, hash-based,
    # identical rows at any scale/partitioning/engine.
    from yougile_etl_pipeline_spark.operators.quality import sample_by_rates

    docs = load_table(spark, sf, "documents").select("doc_id", "source")
    return sample_by_rates(docs, "doc_id", "source", _MIX_RATES,
                           default_rate=_MIX_DEFAULT)


@register("train_pack_sequences", f"""
WITH chunks AS (
  SELECT d.doc_id, d.source,
    CAST((s - 1) // 24 AS BIGINT) AS chunk_idx,
    CAST(least(32, len({_toks()}) - s + 1) AS INTEGER) AS chunk_tokens
  FROM documents d, unnest(range(1, greatest(len({_toks()}), 1) + 1, 24))
       AS t(s)
)
SELECT doc_id, source, chunk_idx, chunk_tokens,
  CAST(COALESCE(CAST(SUM(chunk_tokens) OVER w AS BIGINT), 0) // 256
       AS BIGINT) AS seq_id,
  CAST(COALESCE(CAST(SUM(chunk_tokens) OVER w AS BIGINT), 0) % 256
       AS BIGINT) AS seq_offset
FROM chunks
WINDOW w AS (PARTITION BY source ORDER BY doc_id, chunk_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
""")
def train_pack_sequences(spark, sf):
    # Chunk → training-sequence packing: per-source token streams cut
    # into 256-token sequences (stream packing); source shards are the
    # parallelism unit, so no global sort exists anywhere in the plan.
    docs = load_table(spark, sf, "documents")
    chunks = (TX.chunk_documents(docs, chunk_size=32, stride=24)
              .join(docs.select("doc_id", "source"), "doc_id")
              .select("doc_id", "source", "chunk_idx", "chunk_tokens"))
    return TX.pack_chunks(chunks, seq_tokens=256)


# ---------------------------------------------------------------------------
# E1 Deduplication
# ---------------------------------------------------------------------------

@register("dedup_exact", """
SELECT md5(lower(regexp_replace(text, ' +', ' ', 'g'))) AS fp,
       min(doc_id) AS canonical_id,
       count(*) AS dup_count
FROM documents
GROUP BY 1
""")
def dedup_exact(spark, sf):
    return exact_dedup(load_table(spark, sf, "documents"), "doc_id", "text")


def _shingle_jaccard_oracle(cap: int, threshold: float, n: int = 3) -> str:
    """SQL twin of shingle_jaccard_pairs(block_cols=['lang'],
    max_shingle_df=cap): the stop-shingle cap drops (lang, shingle) groups
    with document frequency above `cap` before the self-join AND before
    the per-doc sizes, mirroring the Spark operator exactly."""
    return f"""
WITH ex0 AS (
  SELECT doc_id AS doc, lang, unnest({_shingles_sql('text', n)}) AS sh
  FROM documents
), dfc AS (
  SELECT lang, sh, count(*) AS dfreq FROM ex0 GROUP BY 1, 2
), ex AS (
  SELECT ex0.doc, ex0.lang, ex0.sh
  FROM ex0 JOIN dfc USING (lang, sh) WHERE dfreq <= {cap}
), sizes AS (
  SELECT doc, count(*) AS sz FROM ex GROUP BY doc
), pairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.lang = b.lang AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, common, sa.sz AS sz_a, sb.sz AS sz_b,
       CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
FROM pairs
JOIN sizes sa ON doc_a = sa.doc
JOIN sizes sb ON doc_b = sb.doc
WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= {threshold}
"""


@register("dedup_shingle_jaccard", _shingle_jaccard_oracle(1000, 0.5))
def dedup_shingle_jaccard(spark, sf):
    docs = load_table(spark, sf, "documents")
    return shingle_jaccard_pairs(docs, "doc_id", "text",
                                 threshold=0.5, block_cols=["lang"])


@register("dedup_shingle_capped", _shingle_jaccard_oracle(3, 0.2, n=2))
def dedup_shingle_capped(spark, sf):
    # Stop-shingle cap exercised for real: on bigrams (hot — max DF 28 at
    # sf0.01) the DF cap 3 drops ~2/3 of (lang, shingle) groups before the
    # self-join, bounding candidates at Σ_kept df² ≤ 9·|shingles| — the
    # 100 TB safety valve, oracle-paired.
    docs = load_table(spark, sf, "documents")
    return shingle_jaccard_pairs(docs, "doc_id", "text", n=2,
                                 threshold=0.2, block_cols=["lang"],
                                 max_shingle_df=3)


_MH_MINS = ", ".join(
    f"min(substr(md5(sh) || md5(sh), {1 + 4 * i}, 16)) AS mh{i}"
    for i in range(8))
_MH_BANDS = " UNION ALL ".join(
    f"SELECT doc, {b} AS band, md5(mh{2 * b} || '|' || mh{2 * b + 1}) AS key "
    f"FROM sig"
    for b in range(4)
)

@register("dedup_minhash_lsh", f"""
WITH ex AS (
  SELECT doc_id AS doc, unnest({_shingles_sql()}) AS sh FROM documents
), sig AS (
  SELECT doc, {_MH_MINS} FROM ex GROUP BY doc
), bk AS (
  {_MH_BANDS}
)
SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_bands
FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
GROUP BY 1, 2
""")
def dedup_minhash_lsh(spark, sf):
    docs = load_table(spark, sf, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=8, bands=4)


@register("dedup_minhash_recall_eval", f"""
WITH truth AS (
  {_shingle_jaccard_oracle(1000, 0.5)}
), ex AS (
  SELECT doc_id AS doc, unnest({_shingles_sql()}) AS sh FROM documents
), sig AS (
  SELECT doc, {_MH_MINS} FROM ex GROUP BY doc
), bk AS (
  {_MH_BANDS}
), cand AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
  GROUP BY 1, 2
), j AS (
  SELECT t.doc_a AS t_a, c.doc_a AS c_a
  FROM truth t FULL OUTER JOIN cand c
    ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
)
SELECT
  CAST(count_if(t_a IS NOT NULL) AS BIGINT) AS n_true,
  CAST(count_if(c_a IS NOT NULL) AS BIGINT) AS n_candidates,
  CAST(count_if(t_a IS NOT NULL AND c_a IS NOT NULL) AS BIGINT) AS n_hits,
  CAST(count_if(t_a IS NOT NULL AND c_a IS NULL) AS BIGINT) AS n_missed,
  CAST(count_if(t_a IS NOT NULL AND c_a IS NOT NULL) AS DOUBLE)
    / CAST(count_if(t_a IS NOT NULL) AS DOUBLE) AS recall,
  CAST(count_if(t_a IS NOT NULL AND c_a IS NOT NULL) AS DOUBLE)
    / CAST(count_if(c_a IS NOT NULL) AS DOUBLE) AS precision
FROM j
""")
def dedup_minhash_recall_eval(spark, sf):
    # Dedup-tier quality measurement (the text analogue of bench.py's
    # ANN recall block, but fully oracle-paired because BOTH sides are
    # exact computations): MinHash-LSH candidate pairs vs the exact
    # shingle-Jaccard >= 0.5 truth set — recall says how much real
    # duplication the banding misses, precision how much candidate
    # verification will discard. Truth is the lang-blocked exact pairs
    # (candidates crossing blocks count as spurious, by definition of
    # the production blocking). One full-outer join of two already-
    # bounded pair sets; ratios divide exact BIGINTs, so the doubles
    # are bit-identical across engines. At 100 TB this runs on a
    # sampled corpus slice — truth is quadratic-bounded by the same
    # stop-shingle cap the production pass uses.
    docs = load_table(spark, sf, "documents")
    truth = shingle_jaccard_pairs(docs, "doc_id", "text",
                                  threshold=0.5, block_cols=["lang"]) \
        .select("doc_a", "doc_b")
    # signature through the tier-shared plan-keyed persist (r17,
    # VERDICT r16 #2): the recall scorecard shares one signature
    # materialization per session with the other banding evals
    from yougile_etl_pipeline_spark.operators.dedup import (
        shared_minhash_signature,
    )

    cand = minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=8, bands=4,
        signature=shared_minhash_signature(docs, "doc_id", "text")) \
        .select("doc_a", "doc_b")
    j = truth.withColumn("t", F.lit(1)).join(
        cand.withColumn("c", F.lit(1)),
        ["doc_a", "doc_b"], "full_outer")
    t_has = F.col("t").isNotNull()
    c_has = F.col("c").isNotNull()
    return j.agg(
        F.count_if(t_has).alias("n_true"),
        F.count_if(c_has).alias("n_candidates"),
        F.count_if(t_has & c_has).alias("n_hits"),
        F.count_if(t_has & ~c_has).alias("n_missed"),
        (F.count_if(t_has & c_has).cast("double")
         / F.count_if(t_has).cast("double")).alias("recall"),
        (F.count_if(t_has & c_has).cast("double")
         / F.count_if(c_has).cast("double")).alias("precision"))


# SimHash, oracle-paired: the per-shingle hash is the first 15 hex chars
# of md5 (60 bits — inside signed int64 on both engines), so DuckDB
# computes the identical signature bit-for-bit. The xxhash64 variant
# (operators/dedup.py::simhash) stays available as the faster JVM-native
# path, property-tested.
_SIMHASH_BITS = ", ".join(
    f"count_if(((hv >> {b}) & 1) = 1) AS b{b}" for b in range(60))
_SIMHASH_SIG = " + ".join(
    f"(CASE WHEN b{b} * 2 > n THEN (1::BIGINT << {b}) ELSE 0 END)"
    for b in range(60))

@register("dedup_simhash", f"""
WITH ex AS (
  SELECT doc_id AS doc, unnest({_shingles_sql('text', 2)}) AS sh
  FROM documents
), h AS (
  SELECT doc, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS hv FROM ex
), agg AS (
  SELECT doc, count(*) AS n, {_SIMHASH_BITS} FROM h GROUP BY doc
)
SELECT doc, CAST({_SIMHASH_SIG} AS BIGINT) AS simhash60 FROM agg
""")
def dedup_simhash(spark, sf):
    return simhash_portable(load_table(spark, sf, "documents"),
                            "doc_id", "text")


@register("dedup_simhash_pairs", f"""
WITH ex AS (
  SELECT doc_id AS doc, unnest({_shingles_sql('text', 2)}) AS sh
  FROM documents
), h AS (
  SELECT doc, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS hv FROM ex
), agg AS (
  SELECT doc, count(*) AS n, {_SIMHASH_BITS} FROM h GROUP BY doc
), sig AS (
  SELECT doc, CAST({_SIMHASH_SIG} AS BIGINT) AS sig FROM agg
), bk AS (
  SELECT doc, sig, b.band,
         (sig >> (b.band * 15)) & 32767 AS bits
  FROM sig, unnest([0, 1, 2, 3]) AS b(band)
)
SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM bk a JOIN bk b ON a.band = b.band AND a.bits = b.bits AND a.doc < b.doc
WHERE bit_count(xor(a.sig, b.sig)) <= 3
""")
def dedup_simhash_pairs(spark, sf):
    # SimHash near-dup pairs: pigeonhole banding (4 bands of 15 bits —
    # Hamming <= 3 forces >=1 exact band match) gives an equi-join
    # candidate set; exact distance verified via bit_count(xor). All
    # integer bit math over the portable md5-window signature, so the
    # oracle reproduces every bit (operators/dedup.py::simhash_ham_pairs).
    from yougile_etl_pipeline_spark.operators.dedup import simhash_ham_pairs

    sig = simhash_portable(load_table(spark, sf, "documents"),
                           "doc_id", "text")
    return simhash_ham_pairs(sig, sig_col="simhash60")


# Connected components over the MinHash-LSH pair graph: pairs are edges,
# the component id (= min reachable doc_id) is the dedup cluster key.
# The Spark side iterates min-label propagation + pointer jumping to the
# unique fixpoint (operators/graph.py); the oracle states the same
# fixpoint declaratively as a recursive CTE (min label reachable). Both
# compute the same function, so value hashes match despite completely
# different evaluation strategies.
_CC_EDGES = f"""
ex AS (
  SELECT doc_id AS doc, unnest({_shingles_sql()}) AS sh FROM documents
), sig AS (
  SELECT doc, {_MH_MINS} FROM ex GROUP BY doc
), bk AS (
  {_MH_BANDS}
), pairs AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key AND a.doc < b.doc
  GROUP BY 1, 2
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
)"""


@register("dedup_clusters", f"""
WITH RECURSIVE {_CC_EDGES}
SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node
""")
def dedup_clusters(spark, sf):
    from yougile_etl_pipeline_spark.operators.graph import (
        connected_components,
    )

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=8, bands=4)
    comp = connected_components(pairs, docs.select("doc_id"),
                                src="doc_a", dst="doc_b", node_col="doc_id")
    return comp.select(F.col("node").alias("doc_id"), "component")


@register("dedup_canonical_docs", f"""
WITH RECURSIVE {_CC_EDGES}, comp AS (
  SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
), sizes AS (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
)
SELECT d.doc_id, d.lang, d.n_chars, s.cluster_size
FROM documents d
JOIN comp c ON c.node = d.doc_id AND c.component = d.doc_id
JOIN sizes s ON s.component = c.component
""")
def dedup_canonical_docs(spark, sf):
    # The dedup'd corpus: one survivor per near-dup cluster (the doc
    # whose id equals the component id), with the collapsed cluster size.
    from yougile_etl_pipeline_spark.operators.graph import (
        canonical_docs,
        connected_components,
    )

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=8, bands=4)
    comp = connected_components(pairs, docs.select("doc_id"),
                                src="doc_a", dst="doc_b", node_col="doc_id")
    return canonical_docs(docs.select("doc_id", "lang", "n_chars"), comp) \
        .select("doc_id", "lang", "n_chars", "cluster_size")


# ---------------------------------------------------------------------------
# E2 Similarity search
# ---------------------------------------------------------------------------

_COS = ("list_dot_product(qv, cv) / "
        "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))")

@register("sim_cosine_topk", f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id AS match_id, embedding::DOUBLE[] AS cv FROM embeddings
), scored AS (
  SELECT query_id, match_id, {_COS} AS cos_sim
  FROM q CROSS JOIN c WHERE query_id != match_id
)
SELECT query_id, match_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rank
      FROM scored)
WHERE rank <= 5
""")
def sim_cosine_topk(spark, sf):
    # numpy-matmul scored, exact-HOF reranked (same bits as the all-HOF
    # brute_force_topk — see operators/similarity.py fast-path notes).
    emb = load_table(spark, sf, "embeddings")
    return brute_force_topk_np(emb, emb.filter(F.col("vec_id") < 8), k=5)


def _lsh_buckets_union(src_sql: str, id_alias: str, vec_alias: str,
                       n_tables: int = 4,
                       planes_per_table: int = 4) -> str:
    """One SELECT per LSH table, unioned — the SQL twin of
    operators.similarity._bucketed (same seeded plane set per sizing)."""
    return " UNION ALL ".join(
        f"SELECT {id_alias}, {vec_alias}, {t} AS tbl, "
        f"{hyperplane_bucket_sql('embedding', t, n_tables=n_tables, planes_per_table=planes_per_table)} AS key FROM {src_sql}"
        for t in range(n_tables)
    )


@register("sim_ann_lsh_bucket", f"""
WITH qsrc AS (SELECT vec_id AS query_id, embedding,
                     embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 8),
csrc AS (SELECT vec_id AS match_id, embedding, embedding::DOUBLE[] AS cv
         FROM embeddings),
qb AS ({_lsh_buckets_union('qsrc', 'query_id', 'qv', 18, 4)}),
cb AS ({_lsh_buckets_union('csrc', 'match_id', 'cv', 18, 4)}),
cand AS (
  SELECT DISTINCT query_id, match_id, qv, cv
  FROM qb JOIN cb USING (tbl, key) WHERE query_id != match_id
), scored AS (
  SELECT query_id, match_id, {_COS} AS cos_sim FROM cand
)
SELECT query_id, match_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rank
      FROM scored)
WHERE rank <= 5
""")
def sim_ann_lsh_bucket(spark, sf):
    # candidate generation identical to lsh_bucket_topk; rerank scored by
    # the vectorized numpy path, winners re-scored exact (same bits).
    #
    # Sizing (L=18 tables x P=4 planes) comes from the collision
    # formula, not taste: the bench corpus is near-isotropic (true top-5
    # neighbors sit at cosine ≈ 0.35, angle θ ≈ 70°), so one plane
    # collides with p = 1 - θ/π ≈ 0.61, one table with p^4 ≈ 0.14, and
    # hitting recall ≥ 0.95 needs L ≈ ln(0.05)/ln(1-0.14) ≈ 18 —
    # measured recall@5 = 0.95 (bench.py recall block). On a corpus this
    # unstructured LSH candidate sets are wide (~2/3 of the corpus); on
    # real embedding corpora (clustered, neighbor cosine ≥ 0.8) the same
    # L covers with far narrower buckets — the formula, with measured θ
    # plugged in, IS the tuning procedure at any scale.
    emb = load_table(spark, sf, "embeddings")
    return lsh_bucket_topk_np(emb, emb.filter(F.col("vec_id") < 8), k=5,
                              n_tables=18, planes_per_table=4)


@register("sim_ann_lsh_sized", f"""
WITH qsrc AS (SELECT vec_id AS query_id, embedding,
                     embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 8),
csrc AS (SELECT vec_id AS match_id, embedding, embedding::DOUBLE[] AS cv
         FROM embeddings),
qb AS ({_lsh_buckets_union('qsrc', 'query_id', 'qv', 2, 6)}),
cb AS ({_lsh_buckets_union('csrc', 'match_id', 'cv', 2, 6)}),
cand AS (
  SELECT DISTINCT query_id, match_id, qv, cv
  FROM qb JOIN cb USING (tbl, key) WHERE query_id != match_id
), scored AS (
  SELECT query_id, match_id, {_COS} AS cos_sim FROM cand
)
SELECT query_id, match_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rank
      FROM scored)
WHERE rank <= 5
""")
def sim_ann_lsh_sized(spark, sf):
    # Non-default LSH sizing (2 tables × 6 planes = 64 buckets/table):
    # proves the sizing is a per-call knob, not a module constant — the
    # 100 TB lever is raising planes with corpus size (bucket occupancy
    # N/2^P) and tables for recall. Oracle regenerates the same seeded
    # planes for this sizing.
    emb = load_table(spark, sf, "embeddings")
    return lsh_bucket_topk(emb, emb.filter(F.col("vec_id") < 8), k=5,
                           n_tables=2, planes_per_table=6)


# ---------------------------------------------------------------------------
# E4 Multimodal columns
# ---------------------------------------------------------------------------

@register("mm_binary_metadata", """
SELECT doc_id AS media_id, 'text' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       substr(hex(encode(text)), 1, 8) AS magic
FROM documents
""")
def mm_binary_metadata(spark, sf):
    docs = load_table(spark, sf, "documents")
    media = attach_binary_payload(docs, "text", "doc_id")
    return binary_metadata(media).select(
        "media_id", "media_type", "n_bytes", "checksum", "magic")


@register("mm_decode_features", """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(length(text) AS DOUBLE) AS f_len,
       CAST(ascii(substr(text, 1, 1)) AS DOUBLE) AS f_first,
       CAST(ascii(substr(text, -1, 1)) AS DOUBLE) AS f_last,
       CAST(list_sum(list_transform(regexp_extract_all(text, '.'),
                                    ch -> ascii(ch))) % 997 AS DOUBLE) AS f_sum
FROM documents
""")
def mm_decode_features(spark, sf):
    # The Arrow-batched mapInPandas decode path with the deterministic
    # fake decoder (real codecs stubbed — none in this environment). The
    # oracle recomputes the byte statistics relationally, proving the
    # plumbing (batching, schema, ordering) loses nothing.
    docs = load_table(spark, sf, "documents")
    media = attach_binary_payload(docs, "text", "doc_id")
    feats = fake_feature_extract(media)
    return feats.select(
        "media_id", "n_bytes",
        F.col("feature").getItem(0).alias("f_len"),
        F.col("feature").getItem(1).alias("f_first"),
        F.col("feature").getItem(2).alias("f_last"),
        F.col("feature").getItem(3).alias("f_sum"))


# ---------------------------------------------------------------------------
# Events: micro-snapshot analytics + JSON flatten + sessionize
# ---------------------------------------------------------------------------

@register("events_hourly_snapshot", """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""")
def events_hourly_snapshot(spark, sf):
    # Batch twin of streaming.snapshot.tumbling_counts (same plan shape).
    ev = load_table(spark, sf, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
                    .alias("total_value"))
              .select(F.col("w.start").alias("window_start"),
                      "event_type", "n_events", "total_value"))


@register("events_json_flatten", """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
""")
def events_json_flatten(spark, sf):
    # P1 analog on semi-structured payloads (the reference flattens nested
    # JSON with json_normalize, dags/yougile_etl_dag.py:87).
    ev = load_table(spark, sf, "events")
    return (ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
              .groupBy("k")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
                    .alias("total_value")))


@register("events_sessionize", """
SELECT user_id,
       CAST(count_if(prev_ms IS NULL OR ms - prev_ms > 1800000) AS BIGINT)
         AS session_count,
       count(*) AS n_events
FROM (
  SELECT user_id, epoch_ms(ts) AS ms,
         lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ms
  FROM events
)
GROUP BY user_id
""")
def events_sessionize(spark, sf):
    from pyspark.sql.window import Window

    ev = load_table(spark, sf, "events").withColumn(
        "ms", F.unix_millis("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = ev.withColumn("prev_ms", F.lag("ms").over(w))
    new_sess = F.col("prev_ms").isNull() | \
        ((F.col("ms") - F.col("prev_ms")) > 30 * 60 * 1000)
    return ev.groupBy("user_id").agg(
        F.count_if(new_sess).alias("session_count"),
        F.count(F.lit(1)).alias("n_events"))


@register("events_asof_join", """
WITH c AS (
  SELECT user_id, epoch_ms(ts) AS ms, event_id FROM events
  WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS purchase_ms
  FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ms,
         c.ms AS click_ms, c.event_id AS click_id,
         row_number() OVER (
           PARTITION BY p.purchase_id
           ORDER BY c.ms DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn
  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ms <= p.purchase_ms
)
SELECT purchase_id, user_id, purchase_ms, click_ms, click_id
FROM j WHERE rn = 1
""")
def events_asof_join(spark, sf):
    # As-of join: each purchase picks the user's LATEST click at or
    # before it (backward inclusive; ties on ts broken by greatest
    # event_id). Spark side is the union-sort formulation — one shuffle,
    # no quadratic candidates (operators/relational.py::asof_join); the
    # oracle states the same pick as an argmax over the naive theta-join.
    from yougile_etl_pipeline_spark.operators.relational import asof_join

    ev = load_table(spark, sf, "events").withColumn(
        "ms", F.unix_millis("ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", "ms", "event_id"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select(F.col("event_id").alias("purchase_id"),
                           "user_id", F.col("ms").alias("purchase_ms")))
    out = asof_join(purchases, clicks, on="user_id",
                    left_ts="purchase_ms", right_ts="ms",
                    right_cols=["event_id"], suffix="_asof")
    return out.select("purchase_id", "user_id", "purchase_ms",
                      F.col("ms_asof").alias("click_ms"),
                      F.col("event_id_asof").alias("click_id"))


@register("events_asof_forward", """
WITH c AS (
  SELECT user_id, epoch_ms(ts) AS ms, event_id FROM events
  WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS purchase_ms
  FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ms,
         c.ms AS next_click_ms, c.event_id AS next_click_id,
         row_number() OVER (
           PARTITION BY p.purchase_id
           ORDER BY c.ms ASC NULLS LAST, c.event_id ASC NULLS LAST) AS rn
  FROM p LEFT JOIN c ON c.user_id = p.user_id
                    AND c.ms >= p.purchase_ms
                    AND c.ms - p.purchase_ms <= 7200000
)
SELECT purchase_id, user_id, purchase_ms, next_click_ms, next_click_id
FROM j WHERE rn = 1
""")
def events_asof_forward(spark, sf):
    # Forward as-of with tolerance: each purchase picks the user's
    # EARLIEST click at or after it, voided beyond 2 hours — the "next
    # action within the attribution window" query, pandas
    # merge_asof(direction='forward', tolerance=...) parity. Same
    # union-sort single-shuffle plan as backward (the direction flips
    # only the sort; tolerance is a post-window mask on the one matched
    # row — a nearer-than-tolerance match can't hide behind a farther
    # one).
    from yougile_etl_pipeline_spark.operators.relational import asof_join

    ev = load_table(spark, sf, "events").withColumn(
        "ms", F.unix_millis("ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", "ms", "event_id"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select(F.col("event_id").alias("purchase_id"),
                           "user_id", F.col("ms").alias("purchase_ms")))
    out = asof_join(purchases, clicks, on="user_id",
                    left_ts="purchase_ms", right_ts="ms",
                    right_cols=["event_id"], suffix="_asof",
                    direction="forward", tolerance=F.lit(7200000))
    return out.select("purchase_id", "user_id", "purchase_ms",
                      F.col("ms_asof").alias("next_click_ms"),
                      F.col("event_id_asof").alias("next_click_id"))


@register("corpus_clean_pipeline", f"""
WITH RECURSIVE {_CC_EDGES}, comp AS (
  SELECT node, MIN(lbl) AS component FROM reach GROUP BY node
), rep AS (
  SELECT doc_id,
    {_top_frac_sql(_BIGRAMS_SQL)} AS top_bigram_frac,
    {_DUP_RATIO_SQL} AS dup_token_ratio
  FROM documents
), qual AS (
  {_QUALITY_SQL}
)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
JOIN comp c ON c.node = d.doc_id AND c.component = d.doc_id
JOIN rep r ON r.doc_id = d.doc_id
JOIN qual q ON q.doc_id = d.doc_id
WHERE r.top_bigram_frac <= 0.18 AND r.dup_token_ratio <= 0.9
  AND q.quality >= 0.5
""")
def corpus_clean_pipeline(spark, sf):
    # The full training-corpus cleaning flow as ONE lazy lineage:
    # repetition filter + quality threshold + near-dup collapse (keep
    # only each MinHash-LSH cluster's canonical doc). Every stage is an
    # operator defined elsewhere in this package — this query is the
    # composition a reference user would actually run, and its oracle is
    # the composition of the per-stage oracle fragments.
    from yougile_etl_pipeline_spark.operators.graph import (
        connected_components,
    )

    docs = load_table(spark, sf, "documents")
    rep = TX.repetition_stats(docs).select(
        "doc_id", "repetition_ok")
    qual = TX.quality_score(docs).select("doc_id", "quality")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n_hashes=8, bands=4)
    comp = connected_components(pairs, docs.select("doc_id"),
                                src="doc_a", dst="doc_b", node_col="doc_id")
    canon = comp.filter(F.col("node") == F.col("component")) \
                .select(F.col("node").alias("doc_id"))
    return (docs.join(rep, "doc_id").join(qual, "doc_id")
                .join(canon, "doc_id")
                .filter(F.col("repetition_ok") & (F.col("quality") >= 0.5))
                .select("doc_id", "lang", "source", "n_chars"))


@register("text_inverted_index", f"""
SELECT term,
  CAST(count(DISTINCT doc) AS BIGINT) AS df,
  array_to_string(list_sort(list(DISTINCT doc)), ' ') AS postings
FROM (
  SELECT doc_id AS doc, unnest({_toks()}) AS term FROM documents
)
GROUP BY term
""")
def text_inverted_index(spark, sf):
    # Inverted-index build: term -> document frequency + sorted posting
    # list. explode + grouped collect_set (map-side partial) + array_sort
    # keeps the result partition-order independent. At 100 TB posting
    # lists for hot terms are sharded (term, shard) rather than one array
    # row — the grouping shape is identical; the array payload here is
    # the test-scale representation. Postings are serialized to a
    # space-joined string at the query boundary: the certification
    # driver's canonicalizer hashes scalar cells only (raw array columns
    # are unhashable there — CORRECTNESS_r03).
    docs = load_table(spark, sf, "documents")
    ex = docs.select(F.col("doc_id").alias("doc"),
                     F.explode(TX.tokens("text")).alias("term"))
    return ex.groupBy("term").agg(
        F.count_distinct("doc").alias("df"),
        F.array_join(F.array_sort(F.collect_set("doc"))
                      .cast("array<string>"), " ").alias("postings"))


@register("events_funnel", """
SELECT user_id,
  CAST(count_if(event_type = 'click') AS BIGINT) AS n_clicks,
  CAST(count_if(event_type = 'cart') AS BIGINT) AS n_carts,
  CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchases,
  (min(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END) IS NOT NULL
   AND min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END)
       IS NOT NULL
   AND min(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END)
       < min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END))
    AS converted
FROM events GROUP BY user_id
""")
def events_funnel(spark, sf):
    # First-touch funnel: a user "converted" iff their first click
    # precedes their first purchase. ONE conditional aggregation per
    # user — single keyed shuffle with map-side partials, no joins, no
    # windows; the standard scale-shape for funnel metrics.
    ev = load_table(spark, sf, "events").withColumn(
        "ms", F.unix_millis("ts"))
    first = lambda t: F.min(F.when(F.col("event_type") == t,  # noqa: E731
                                   F.col("ms")))
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "click").alias("n_clicks"),
        F.count_if(F.col("event_type") == "cart").alias("n_carts"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        (first("click").isNotNull() & first("purchase").isNotNull()
         & (first("click") < first("purchase"))).alias("converted"))


@register("stream_tumbling_counts", """
WITH mx AS (SELECT epoch_ms(max(ts)) AS m FROM events),
agg AS (
  SELECT date_trunc('hour', ts) AS ws, event_type,
         count(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, n_events, total_value
FROM agg, mx
WHERE epoch_ms(ws + INTERVAL 1 HOUR) <= m - 7200000
""")
def stream_tumbling_counts(spark, sf):
    # Hash-exact oracle via the deterministic-projection pattern
    # (r06 VERDICT #2, the stream_dedup_keys template): under an
    # availableNow drain of a static snapshot the append-mode emission
    # set IS deterministic — the final watermark lands at
    # max(event_time)-2h, so exactly the tumbling windows with
    # window_end <= max_ts_ms - 7 200 000 flush, with counts/sums over
    # ALL their events (nothing was evicted mid-drain; event_id is
    # unique so the in-stream dedup passes every row). The oracle
    # computes that same set in closed form; window_start crosses the
    # boundary as a formatted string (timestamp canon varies by
    # session TZ, strings do not).
    from yougile_etl_pipeline_spark.streaming.snapshot import run_available_now

    return run_available_now(spark, sf).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
         .alias("window_start"),
        "event_type", "n_events", "total_value")


@register("stream_click_attribution", """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND epoch_ms(p.ts) > epoch_ms(c.ts)
 AND epoch_ms(p.ts) <= epoch_ms(c.ts) + 300000
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
""")
def stream_click_attribution(spark, sf):
    # Hash-exact oracle via the deterministic-projection pattern
    # (VERDICT r10 #2, retiring the engine's last rows-only entry —
    # the stream_dedup_keys r07 template): an INNER stream-stream join
    # emits a matched pair the moment both sides are buffered, never
    # on watermark advance, so under an availableNow drain of a static
    # snapshot the append-mode emission set IS deterministic — exactly
    # the batch interval-join row-set (nothing is evicted before
    # matching: eviction needs the watermark to PASS a row, and the
    # final watermark of a drained snapshot trails max(event_time) by
    # the full 2h delay, far beyond the 5-min join range). The oracle
    # therefore states the same naive inequality join the batch
    # events_interval_join carries; tests/test_streaming_multimodal.py
    # additionally asserts literal row-set equality between this
    # streaming query and that batch entry on the same input.
    from yougile_etl_pipeline_spark.streaming.joins import (
        run_attribution_available_now,
    )

    return run_attribution_available_now(spark, sf).select(
        "user_id", "click_id", "purchase_id", "gap_ms")


# ---------------------------------------------------------------------------
# E2b: IVF ANN + embedding-cosine near-dup; E4b: frame sampling
# ---------------------------------------------------------------------------

@register("ivf_kmeans_step", """
WITH csrc AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
a AS (
  SELECT vec_id, vec, centroid_id FROM (
    SELECT vec_id, vec, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY list_dot_product(vec, cent_vec) /
                                (sqrt(list_dot_product(vec, vec)) *
                                 sqrt(list_dot_product(cent_vec, cent_vec)))
                                DESC, centroid_id) AS rn
    FROM csrc CROSS JOIN (
      SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cent_vec
      FROM embeddings WHERE vec_id < 256)
  ) WHERE rn <= 1
)
SELECT centroid_id, CAST(t.i - 1 AS INTEGER) AS pos,
       CAST(count(*) AS BIGINT) AS n_assigned,
       CAST(SUM(CAST(vec[t.i] AS DECIMAL(20,9))) AS DOUBLE) / count(*)
         AS mean_val
FROM a, unnest(range(1, len(vec) + 1)) AS t(i)
GROUP BY 1, 2
""")
def ivf_kmeans_step(spark, sf):
    # One Lloyd step of IVF centroid training: nearest-centroid
    # assignment + fixed-point per-dimension mean (engine-portable via
    # DECIMAL sums — operators/similarity.py::kmeans_update).
    from yougile_etl_pipeline_spark.operators.similarity import kmeans_update

    emb = load_table(spark, sf, "embeddings")
    return kmeans_update(emb, emb.filter(F.col("vec_id") < 256))


# Deterministic centroid set sized by the √N policy (the standard IVF
# coarse-quantizer rule: n_centroids ≈ √|corpus| balances list length
# N/C against probe count C) — and the policy is LITERAL in the query:
# the centroid count is a scalar subquery over the corpus itself, so
# the same query text stays correctly sized at every scale factor
# (measured recall@5: 0.975/1.0 at sf0.1 nprobe=1/3, 0.875/0.9 at
# sf0.01 — the earlier fixed 256 starved lists to ~8 rows and 0.725
# recall; a fixed 64 was right at one SF and wrong at every other).
# A deterministic id-prefix sample (not k-means output) keeps the
# query oracle-exact; callers plug kmeans_train centers for
# production quality.
_IVF_NCENT = ("(SELECT CAST(round(sqrt(count(*))) AS BIGINT) "
              "FROM embeddings)")
_IVF_CENT = ("SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cent_vec "
             f"FROM embeddings WHERE vec_id < {_IVF_NCENT}")
_CSIM = ("list_dot_product({a}, {b}) / "
         "(sqrt(list_dot_product({a}, {a})) * "
         "sqrt(list_dot_product({b}, {b})))")


def _ivf_assign_sql(src: str, idc: str, vecc: str, nprobe: int = 1) -> str:
    """DuckDB twin of similarity.ivf_assign (top-nprobe centroids per
    vector by cosine, centroid id tie-break)."""
    sim = _CSIM.format(a=vecc, b="cent_vec")
    return f"""
  SELECT {idc}, {vecc}, centroid_id FROM (
    SELECT {idc}, {vecc}, centroid_id,
           row_number() OVER (PARTITION BY {idc}
                              ORDER BY {sim} DESC, centroid_id) AS rn
    FROM {src} CROSS JOIN ({_IVF_CENT})
  ) WHERE rn <= {nprobe}"""


@register("sim_ivf_topk", f"""
WITH qsrc AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 8),
csrc AS (SELECT vec_id AS match_id, embedding::DOUBLE[] AS cv
         FROM embeddings),
qa AS ({_ivf_assign_sql('qsrc', 'query_id', 'qv')}),
ca AS ({_ivf_assign_sql('csrc', 'match_id', 'cv')}),
scored AS (
  SELECT query_id, match_id, centroid_id,
         {_CSIM.format(a='qv', b='cv')} AS cos_sim
  FROM qa JOIN ca USING (centroid_id)
  WHERE query_id != match_id
)
SELECT query_id, match_id, centroid_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rank
      FROM scored)
WHERE rank <= 5
""")
def sim_ivf_topk(spark, sf):
    # IVF coarse-quantizer ANN: centroids are a deterministic sample of
    # the corpus sized by the √N policy, computed FROM the corpus (one
    # footer-stat count — see _IVF_CENT note; callers may plug k-means
    # centers instead). numpy assignment (matmul argmax), exact HOF
    # rerank — same bits as the all-HOF ivf_topk.
    import math

    from yougile_etl_pipeline_spark.operators.similarity import ivf_topk_np

    emb = load_table(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < int(round(math.sqrt(
        table_row_count(sf, "embeddings")))))
    return ivf_topk_np(emb, emb.filter(F.col("vec_id") < 8), centroids, k=5)


@register("sim_ivf_multiprobe", f"""
WITH qsrc AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 8),
csrc AS (SELECT vec_id AS match_id, embedding::DOUBLE[] AS cv
         FROM embeddings),
qa AS ({_ivf_assign_sql('qsrc', 'query_id', 'qv', nprobe=3)}),
ca AS ({_ivf_assign_sql('csrc', 'match_id', 'cv')}),
scored AS (
  SELECT query_id, match_id, centroid_id,
         {_CSIM.format(a='qv', b='cv')} AS cos_sim
  FROM qa JOIN ca USING (centroid_id)
  WHERE query_id != match_id
)
SELECT query_id, match_id, centroid_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rank
      FROM scored)
WHERE rank <= 5
""")
def sim_ivf_multiprobe(spark, sf):
    # nprobe=3: each query probes its 3 nearest centroids' lists — the
    # standard IVF recall knob (recall monotone in nprobe, cost linear);
    # corpus lists stay 1-probe/storable. Oracle states the same top-3
    # probe set relationally. √N centroids per _IVF_CENT.
    import math

    from yougile_etl_pipeline_spark.operators.similarity import ivf_topk_np

    emb = load_table(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < int(round(math.sqrt(
        table_row_count(sf, "embeddings")))))
    return ivf_topk_np(emb, emb.filter(F.col("vec_id") < 8), centroids, k=5,
                       nprobe=3)


@register("dedup_embedding_cosine_w6", f"""
WITH b AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
         {hyperplane_bucket_sql('embedding', 0, planes_per_table=6)} AS key
  FROM embeddings
), pairs AS (
  SELECT a.id AS id_a, c.id AS id_b,
         {_CSIM.format(a='a.v', b='c.v')} AS cos_sim
  FROM b a JOIN b c ON a.key = c.key AND a.id < c.id
)
SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.25
""")
def dedup_embedding_cosine_w6(spark, sf):
    # Non-default bucket width (6 planes → 64 buckets): the parameter that
    # keeps bucket-local comparison sub-quadratic as the corpus grows
    # (occupancy N/2^n_planes). Same seeded planes on both sides.
    from yougile_etl_pipeline_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    emb = load_table(spark, sf, "embeddings")
    return cosine_near_dup_pairs(emb, 0.25, n_planes=6)


@register("dedup_embedding_cosine", f"""
WITH b AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v,
         {hyperplane_bucket_sql('embedding', 0)} AS key
  FROM embeddings
), pairs AS (
  SELECT a.id AS id_a, c.id AS id_b,
         {_CSIM.format(a='a.v', b='c.v')} AS cos_sim
  FROM b a JOIN b c ON a.key = c.key AND a.id < c.id
)
SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.25
""")
def dedup_embedding_cosine(spark, sf):
    from yougile_etl_pipeline_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    emb = load_table(spark, sf, "embeddings")
    return cosine_near_dup_pairs(emb, 0.25)


@register("mm_frame_sample", """
SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_idx,
       CAST((octet_length(encode(text)) * i) // 3 AS BIGINT) AS frame_offset,
       md5(substr(text,
                  CAST((octet_length(encode(text)) * i) // 3 AS INTEGER) + 1,
                  CAST((octet_length(encode(text)) * (i + 1)) // 3 AS INTEGER)
                  - CAST((octet_length(encode(text)) * i) // 3 AS INTEGER)))
         AS frame_checksum
FROM documents CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)
WHERE doc_id < 100
""")
def mm_frame_sample(spark, sf):
    # One-to-many decode shape (video frame extraction / audio chunking)
    # through streaming mapInPandas; the oracle recomputes the byte-slice
    # checksums relationally (ASCII text ⇒ char slices == byte slices).
    from yougile_etl_pipeline_spark.operators.multimodal import (
        fake_frame_sample,
    )

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    media = attach_binary_payload(docs, "text", "doc_id")
    return fake_frame_sample(media, n_frames=3)


@register("text_zscore_by_lang", """
WITH stats AS (
  SELECT lang, count(*) AS n,
         CAST(SUM(n_chars) AS DOUBLE) AS s,
         CAST(SUM(n_chars * n_chars) AS DOUBLE) AS sq
  FROM documents GROUP BY lang
)
SELECT doc_id, d.lang,
       CASE WHEN sq / n - (s / n) * (s / n) > 0
            THEN (n_chars - s / n) / sqrt(sq / n - (s / n) * (s / n))
            ELSE 0.0 END AS z_chars
FROM documents d JOIN stats USING (lang)
""")
def text_zscore_by_lang(spark, sf):
    # Grouped applyInPandas (per-group Arrow batch -> pandas -> Arrow):
    # per-language z-score of document length. Inputs are exact ints, so
    # the sum/sumsq moments are exact in both numpy (int64) and SQL
    # (BIGINT) and the derived doubles match bit-for-bit — which is what
    # lets a Python-UDF-backed operator carry a full value-hash oracle.
    import pandas as pd

    from pyspark.sql import types as T

    docs = load_table(spark, sf, "documents").select("doc_id", "lang",
                                                     "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        s = float(pdf["n_chars"].sum())          # int64 sum: exact
        sq = float((pdf["n_chars"] * pdf["n_chars"]).sum())
        mean = s / n
        var = sq / n - mean * mean
        z = ((pdf["n_chars"] - mean) / (var ** 0.5)) if var > 0 else 0.0
        return pd.DataFrame({"doc_id": pdf["doc_id"], "lang": pdf["lang"],
                             "z_chars": z})

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("z_chars", T.DoubleType()),
    ])
    return docs.groupBy("lang").applyInPandas(zscore, out_schema)


# ---------------------------------------------------------------------------
# E3b corpus-release operators: PII scrubbing, decontamination, tf-idf
# ---------------------------------------------------------------------------

# The synthetic corpus is a PII-free word soup, so the redaction query
# builds deterministic PII from doc_id on BOTH sides — the oracle then
# actually exercises match + replace, not a no-op.
_AUG_SQL = ("text || ' contact user' || CAST(doc_id AS VARCHAR)"
            " || '@mail.example.com or 555-010-'"
            " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')")
_EMAIL_PAT = TX.PII_PATTERNS["email"]
_PHONE_PAT = TX.PII_PATTERNS["phone"]


@register("text_redact_pii", f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(aug, '{_EMAIL_PAT}')) AS INTEGER) AS n_email,
  CAST(len(regexp_extract_all(aug, '{_PHONE_PAT}')) AS INTEGER) AS n_phone,
  regexp_replace(regexp_replace(aug, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                 '{_PHONE_PAT}', '<PHONE>', 'g') AS text_redacted
FROM (SELECT doc_id, {_AUG_SQL} AS aug FROM documents)
""")
def text_redact_pii(spark, sf):
    # PII scrubbing (operators/text.py::redact_pii): map-only codegen
    # regexes from the Java∩RE2 subset so DuckDB compiles the same
    # automaton. Counts are on the pre-redaction text.
    docs = load_table(spark, sf, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" contact user"),
                 F.col("doc_id").cast("string"),
                 F.lit("@mail.example.com or 555-010-"),
                 F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
                 ).alias("aug"))
    return TX.redact_pii(aug, "aug").select(
        "doc_id", "n_email", "n_phone", "text_redacted")


@register("decontam_ngram_overlap", f"""
WITH grams AS (
  SELECT doc_id, source, unnest({_shingles_sql("text", 8)}) AS g
  FROM documents
), bench AS (
  SELECT DISTINCT g FROM grams WHERE source IN ('src0', 'src1')
)
SELECT doc_id, CAST(count(*) AS INTEGER) AS n_shared_grams
FROM grams JOIN bench USING (g)
WHERE source NOT IN ('src0', 'src1')
GROUP BY doc_id
""")
def decontam_ngram_overlap(spark, sf):
    # Benchmark decontamination (operators/text.py::ngram_contamination):
    # sources src0/src1 stand in for the eval set; its distinct-8-gram
    # side is broadcast, so the training corpus is never shuffled.
    docs = load_table(spark, sf, "documents")
    is_bench = F.col("source").isin("src0", "src1")
    return TX.ngram_contamination(
        docs.filter(~is_bench), docs.filter(is_bench), n=8)


@register("text_tfidf_top_terms", f"""
WITH tf AS (
  SELECT doc_id, t AS term, CAST(count(*) AS INTEGER) AS tf
  FROM (SELECT doc_id, unnest({_toks()}) AS t FROM documents)
  GROUP BY doc_id, t
), dfreq AS (
  SELECT term, CAST(count(*) AS INTEGER) AS df FROM tf GROUP BY term
), nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
SELECT doc_id, term, tf, df, weight, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT doc_id, term, tf, df,
         tf * (CAST(n AS DOUBLE) / df) AS weight,
         row_number() OVER (PARTITION BY doc_id
             ORDER BY tf * (CAST(n AS DOUBLE) / df) DESC, term) AS rank
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
  WHERE df < n
)
WHERE rank <= 3
""")
def text_tfidf_top_terms(spark, sf):
    # Linear-idf top terms (operators/text.py::tfidf_top_terms): weight
    # = tf·(N/df) over df < N — an exact IEEE division instead of the
    # non-bit-portable ln; ubiquitous terms excluded (classical idf
    # zeroes them). See the operator docstring for how the ranking can
    # differ from ln-idf.
    docs = load_table(spark, sf, "documents")
    return TX.tfidf_top_terms(docs, k=3)


# ---------------------------------------------------------------------------
# E2 extension: int8 embedding quantization (operators/quantize.py)
# ---------------------------------------------------------------------------

# Shared DuckDB fragments for symmetric per-vector int8: scale =
# max|x|/127, q = clamp(floor(x/scale + 0.5), ±127). Only IEEE ops that
# are bit-identical across engines (no round() — see quantize.py).
_QSCALE_SQL = """
qv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qs AS (SELECT vec_id, v,
              list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
       FROM qv)
"""

_QCODE = ("CAST(greatest(-127.0, least(127.0, "
          "floor(x / scale + 0.5))) AS INTEGER)")


@register("emb_quantize_int8", f"""
WITH {_QSCALE_SQL},
qq AS (SELECT vec_id, v, scale,
         CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> {_QCODE}) END AS qvec
       FROM qs)
SELECT vec_id, scale,
       list_max(list_transform(range(1, len(v) + 1),
                i -> abs(v[i] - qvec[i] * scale))) AS max_abs_err,
       list_max(list_transform(range(1, len(v) + 1),
                i -> abs(v[i] - qvec[i] * scale))) <= scale * 0.5
         AS within_half_step
FROM qq
""")
def emb_quantize_int8(spark, sf):
    # Per-vector int8 report (operators/quantize.py::quantize_summary):
    # scale, worst reconstruction error, and the computed half-step
    # bound. Map-only — the 100 TB story is 4-8x narrower storage and
    # shuffle for every downstream embedding op.
    from yougile_etl_pipeline_spark.operators.quantize import quantize_summary
    return quantize_summary(load_table(spark, sf, "embeddings"))


@register("sim_topk_int8", f"""
WITH {_QSCALE_SQL},
dq AS (SELECT vec_id,
         CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
              ELSE list_transform(v, x -> {_QCODE} * scale) END AS emb
       FROM qs),
q AS (SELECT vec_id AS query_id, emb AS qv FROM dq WHERE vec_id < 8),
c AS (SELECT vec_id AS match_id, emb AS cv FROM dq),
scored AS (
  SELECT query_id, match_id, {_COS} AS cos_sim
  FROM q CROSS JOIN c WHERE query_id != match_id
)
SELECT query_id, match_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, match_id) AS rank
      FROM scored)
WHERE rank <= 5
""")
def sim_topk_int8(spark, sf):
    # Brute-force cosine top-k over DEQUANTIZED vectors — demonstrates
    # that search composes with int8 storage unchanged (recall vs full
    # precision is property-tested). Same numpy-scored/HOF-reranked
    # fast path as sim_cosine_topk.
    from yougile_etl_pipeline_spark.operators.quantize import (
        dequantize,
        quantize_int8,
    )
    emb = load_table(spark, sf, "embeddings")
    dq = quantize_int8(emb).select(
        "vec_id", dequantize("qvec", "scale").alias("embedding"))
    return brute_force_topk_np(dq, dq.filter(F.col("vec_id") < 8), k=5)


# ---------------------------------------------------------------------------
# E3/E6 extension: vocabulary coverage (operators/text.py)
# ---------------------------------------------------------------------------

_VOCAB_SQL = f"""
tok AS (SELECT doc_id, unnest({_toks()}) AS token FROM documents),
tfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
          FROM tok GROUP BY token),
ranked AS (SELECT token, freq,
                  CAST(row_number() OVER (ORDER BY freq DESC, token)
                       AS BIGINT) AS rank
           FROM tfreq)
"""


@register("text_vocab_topv", f"""
WITH {_VOCAB_SQL}
SELECT token, freq, rank FROM ranked WHERE rank <= 100
""")
def text_vocab_topv(spark, sf):
    # Corpus top-V vocabulary (operators/text.py::build_vocab):
    # map-side-combined token counts + distributed TakeOrdered top-V;
    # ties broken lexicographically so rank 1..V is deterministic.
    docs = load_table(spark, sf, "documents")
    return TX.build_vocab(docs, top_v=100)


@register("text_oov_rate", f"""
WITH {_VOCAB_SQL},
vocab AS (SELECT token FROM ranked WHERE rank <= 100)
SELECT t.doc_id,
       CAST(count(*) AS INTEGER) AS n_tokens,
       CAST(count(*) FILTER (WHERE v.token IS NULL) AS INTEGER) AS n_oov,
       CAST(count(*) FILTER (WHERE v.token IS NULL) AS DOUBLE) / count(*)
         AS oov_rate
FROM tok t LEFT JOIN vocab v ON t.token = v.token
GROUP BY t.doc_id
""")
def text_oov_rate(spark, sf):
    # Per-doc OOV share vs the corpus top-100 vocab
    # (operators/text.py::oov_stats): broadcast vocab join, exact int
    # counts, one IEEE division.
    docs = load_table(spark, sf, "documents")
    vocab = TX.build_vocab(docs, top_v=100)
    return TX.oov_stats(docs, vocab)


# ---------------------------------------------------------------------------
# Layout: Z-order clustering (operators/layout.py)
# ---------------------------------------------------------------------------

def _zorder_oracle() -> str:
    from yougile_etl_pipeline_spark.operators.layout import z_value_sql
    return f"""
WITH zb AS (
  SELECT CAST(min(l_partkey) AS BIGINT) AS xmin,
         CAST(max(l_partkey) AS BIGINT) AS xmax,
         CAST(min(l_suppkey) AS BIGINT) AS ymin,
         CAST(max(l_suppkey) AS BIGINT) AS ymax
  FROM lineitem
), zn AS (
  SELECT l_partkey, l_suppkey,
    CASE WHEN xmax = xmin THEN 0
         ELSE CAST(floor((l_partkey - xmin) * 1023.0
                         / CAST(xmax - xmin AS DOUBLE)) AS BIGINT)
    END AS xs,
    CASE WHEN ymax = ymin THEN 0
         ELSE CAST(floor((l_suppkey - ymin) * 1023.0
                         / CAST(ymax - ymin AS DOUBLE)) AS BIGINT)
    END AS ys
  FROM lineitem CROSS JOIN zb
), zv AS (
  SELECT l_partkey, l_suppkey, {z_value_sql('xs', 'ys', bits=10)} AS zval
  FROM zn
)
SELECT zval >> 14 AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(l_partkey) AS BIGINT) AS x_lo,
       CAST(max(l_partkey) AS BIGINT) AS x_hi,
       CAST(min(l_suppkey) AS BIGINT) AS y_lo,
       CAST(max(l_suppkey) AS BIGINT) AS y_hi
FROM zv GROUP BY bucket
"""


@register("layout_zorder_profile", _zorder_oracle())
def layout_zorder_profile(spark, sf):
    # Z-order clustering report (operators/layout.py::zorder_profile):
    # Morton-interleave (l_partkey, l_suppkey) on a 10-bit grid, bucket
    # by the top 6 bits (= the files a z-clustered write produces), and
    # emit each bucket's bounding box — the parquet footer stats either
    # single-column predicate would prune on.
    from yougile_etl_pipeline_spark.operators.layout import zorder_profile
    li = load_table(spark, sf, "lineitem")
    return zorder_profile(li, "l_partkey", "l_suppkey",
                          bits=10, bucket_bits=6)


# ---------------------------------------------------------------------------
# Ops diagnostics: join-key skew profile (operators/quality.py)
# ---------------------------------------------------------------------------

@register("quality_key_skew", """
WITH per_key AS (
  SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS key_rows
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(sum(key_rows) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS nkeys
  FROM per_key
)
SELECT key, key_rows,
       CAST(key_rows AS DOUBLE) / total AS row_share,
       CAST(key_rows AS DOUBLE) * nkeys / total AS skew_ratio
FROM per_key CROSS JOIN tot
ORDER BY key_rows DESC, key
LIMIT 10
""")
def quality_key_skew(spark, sf):
    # Join-key skew report (operators/quality.py::key_skew_profile) on
    # orders.o_custkey: top-10 heaviest keys with exact counts, table
    # share, and count/mean ratio — the diagnostic that chooses between
    # plain shuffle join, salted_join, and AQE skew handling. groupBy
    # partially aggregates map-side; totals ride a broadcast 1-row
    # cross join; top-N is TakeOrdered (never a global sort).
    from yougile_etl_pipeline_spark.operators.quality import key_skew_profile
    return key_skew_profile(load_table(spark, sf, "orders"),
                            "o_custkey", top=10)


# ---------------------------------------------------------------------------
# Incremental ingest dedup: new batch vs known-fingerprint store
# (operators/dedup.py::dedup_incremental)
# ---------------------------------------------------------------------------

_FP_SQL = "md5(lower(regexp_replace(text, ' +', ' ', 'g')))"


@register("dedup_incremental_batch", f"""
WITH batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 4 IN (0, 1, 3)
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 4 = 3
), fp AS (
  SELECT doc_id, {_FP_SQL} AS fp FROM batch
), known AS (
  SELECT DISTINCT {_FP_SQL} AS fp
  FROM documents WHERE doc_id % 4 IN (1, 2)
), canon AS (
  SELECT fp, min(doc_id) AS min_id FROM fp GROUP BY fp
)
SELECT f.doc_id, f.fp,
       CASE WHEN k.fp IS NOT NULL THEN 'known_dup'
            WHEN f.doc_id <> c.min_id THEN 'batch_dup'
            ELSE 'new' END AS status
FROM fp f LEFT JOIN known k ON f.fp = k.fp JOIN canon c ON f.fp = c.fp
""")
def dedup_incremental_batch(spark, sf):
    # Incremental-ingest dedup (operators/dedup.py::dedup_incremental):
    # a new batch is checked against the already-ingested corpus via its
    # fingerprint store only — never rescanning corpus text. The batch
    # here is built to exercise all three verdicts: doc_id%4==0 docs are
    # unseen ('new'), %4==1 docs are already in the store ('known_dup'),
    # and %4==3 docs appear twice under two ids (smaller id 'new',
    # re-keyed copy 'batch_dup').
    from yougile_etl_pipeline_spark.operators.dedup import dedup_incremental
    docs = load_table(spark, sf, "documents")
    m = F.col("doc_id") % 4
    batch = (docs.filter(m.isin(0, 1, 3)).select("doc_id", "text")
             .unionByName(docs.filter(m == 3).select(
                 (F.col("doc_id") + 100000).alias("doc_id"), "text")))
    known = docs.filter(m.isin(1, 2)).select(
        TX.fingerprint_exact("text").alias("fp"))
    return dedup_incremental(batch, known)


# ---------------------------------------------------------------------------
# Train/val/test split (operators/quality.py::train_val_test_split)
# ---------------------------------------------------------------------------

@register("quality_train_split", """
SELECT doc_id,
  CASE WHEN b < 9000 THEN 'train'
       WHEN b < 9500 THEN 'val'
       ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 10000 AS b
  FROM documents)
""")
def quality_train_split(spark, sf):
    # Leakage-proof deterministic 90/5/5 split: the label depends only
    # on md5(doc_id), so corpus growth, re-runs, and repartitioning
    # never move an existing document across splits. Per-row predicate,
    # no shuffle.
    from yougile_etl_pipeline_spark.operators.quality import (
        train_val_test_split,
    )
    docs = load_table(spark, sf, "documents").select("doc_id")
    return train_val_test_split(docs, "doc_id")


# ---------------------------------------------------------------------------
# Snapshot diff audit (plans/incremental.py::snapshot_diff)
# ---------------------------------------------------------------------------

@register("snapshot_diff_audit", """
WITH old_s AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
  WHERE o_orderkey % 5 <> 0
), new_s AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 3 <> 0
), j AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new,
         coalesce(array_to_string(list_filter(
           [CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                 THEN 'o_totalprice' END,
            CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                 THEN 'o_orderstatus' END],
           x -> x IS NOT NULL), ','), '') AS cc
  FROM old_s o FULL JOIN new_s n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey,
  CASE WHEN NOT in_old THEN 'added'
       WHEN NOT in_new THEN 'removed'
       WHEN cc <> '' THEN 'changed'
       ELSE 'unchanged' END AS status,
  CASE WHEN in_old AND in_new THEN cc ELSE '' END AS changed_cols
FROM j
""")
def snapshot_diff_audit(spark, sf):
    # CDC-style two-snapshot diff (plans/incremental.py::snapshot_diff):
    # "previous load" = orders minus the %5==0 keys (those become
    # 'added'), "current load" = orders minus %3==0 ('removed') with
    # %7==0 totalprices doubled ('changed', exact *2 so the double stays
    # bit-identical). One full-outer shuffle join on the business key.
    from yougile_etl_pipeline_spark.plans.incremental import snapshot_diff
    o = load_table(spark, sf, "orders")
    old = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    new = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2)
         .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderstatus")
    return snapshot_diff(old, new, ["o_orderkey"],
                         ["o_totalprice", "o_orderstatus"])


# ---------------------------------------------------------------------------
# E9 complement: semantic (embedding-space) benchmark decontamination
# (operators/similarity.py::embedding_decontaminate)
# ---------------------------------------------------------------------------

@register("decontam_embedding", """
WITH b AS (
  SELECT embedding::DOUBLE[] AS bv FROM embeddings WHERE vec_id < 8
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 8
), s AS (
  SELECT vec_id,
         max(list_dot_product(cv, bv) /
             (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(bv, bv))))
           AS max_benchmark_cos
  FROM c CROSS JOIN b GROUP BY vec_id
)
SELECT vec_id, max_benchmark_cos,
       max_benchmark_cos >= 0.3 AS contaminated
FROM s
""")
def decontam_embedding(spark, sf):
    # Embedding-space decontamination: n-gram overlap
    # (decontam_ngram_overlap) catches verbatim eval leakage; this
    # catches paraphrases that share no 8-gram but embed next to an
    # eval item. Benchmark = vec_id < 8 (broadcast), corpus = the rest;
    # max cosine per corpus vector, flagged at 0.3 (chosen to exercise
    # both branches at sf0.01 — the cos doubles are bit-identical to
    # the oracle at ANY threshold).
    from yougile_etl_pipeline_spark.operators.similarity import (
        embedding_decontaminate,
    )
    emb = load_table(spark, sf, "embeddings")
    return embedding_decontaminate(emb.filter(F.col("vec_id") >= 8),
                                   emb.filter(F.col("vec_id") < 8),
                                   threshold=0.3)


# ---------------------------------------------------------------------------
# Bloom-prefiltered incremental dedup (operators/dedup.py::
# dedup_incremental_bloom)
# ---------------------------------------------------------------------------

@register("dedup_incremental_bloom", f"""
WITH batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 4 IN (0, 1, 3)
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 4 = 3
), fp AS (
  SELECT doc_id, {_FP_SQL} AS fp FROM batch
), known AS (
  SELECT DISTINCT {_FP_SQL} AS fp
  FROM documents WHERE doc_id % 4 IN (1, 2)
), canon AS (
  SELECT fp, min(doc_id) AS min_id FROM fp GROUP BY fp
)
SELECT f.doc_id, f.fp,
       CASE WHEN k.fp IS NOT NULL THEN 'known_dup'
            WHEN f.doc_id <> c.min_id THEN 'batch_dup'
            ELSE 'new' END AS status
FROM fp f LEFT JOIN known k ON f.fp = k.fp JOIN canon c ON f.fp = c.fp
""")
def dedup_incremental_bloom_q(spark, sf):
    # Same batch/store composition — and the SAME oracle — as
    # dedup_incremental_batch: the Bloom bitmap is a prefilter, not a
    # semantics change (no false negatives by construction; false
    # positives resolve in the exact left join). A hash-mismatch here
    # would mean the bitmap dropped a stored fingerprint — the exactness
    # property, machine-checked at every threshold.
    from yougile_etl_pipeline_spark.operators.dedup import (
        dedup_incremental_bloom,
    )
    docs = load_table(spark, sf, "documents")
    m = F.col("doc_id") % 4
    batch = (docs.filter(m.isin(0, 1, 3)).select("doc_id", "text")
             .unionByName(docs.filter(m == 3).select(
                 (F.col("doc_id") + 100000).alias("doc_id"), "text")))
    known = docs.filter(m.isin(1, 2)).select(
        TX.fingerprint_exact("text").alias("fp"))
    return dedup_incremental_bloom(batch, known)


# ---------------------------------------------------------------------------
# Mergeable incremental aggregation (plans/incremental.py::
# merge_aggregates)
# ---------------------------------------------------------------------------

@register("agg_incremental_merge", """
SELECT o_orderstatus,
       count(*) AS cnt,
       CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) AS total,
       min(o_totalprice) AS min_v,
       max(o_totalprice) AS max_v,
       CAST(sum(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) / count(*)
         AS mean_v
FROM orders
GROUP BY o_orderstatus
""")
def agg_incremental_merge(spark, sf):
    # History (o_orderkey % 3 != 0) already lives as stored mergeable
    # state; only the new batch's facts are aggregated, then the two
    # states merge. The oracle recomputes over ALL facts — equality IS
    # the merge-correctness property (exact decimal sums make it hold
    # bitwise regardless of merge order). The 100 TB point: the daily
    # job reads one day, not the full history.
    from yougile_etl_pipeline_spark.plans.incremental import (
        merge_aggregates,
        partial_aggregate,
    )
    orders = load_table(spark, sf, "orders")
    stored = partial_aggregate(
        orders.filter(F.col("o_orderkey") % 3 != 0),
        ["o_orderstatus"], "o_totalprice")
    batch = partial_aggregate(
        orders.filter(F.col("o_orderkey") % 3 == 0),
        ["o_orderstatus"], "o_totalprice")
    return (merge_aggregates(stored, batch, ["o_orderstatus"])
            .withColumn("total", F.col("total").cast("double")))


# ---------------------------------------------------------------------------
# LM quality score (operators/text.py::lm_quality_score)
# ---------------------------------------------------------------------------

@register("text_lm_quality", """
WITH norm AS (
  SELECT doc_id, lower(regexp_replace(text, ' +', ' ', 'g')) AS t
  FROM documents
), tg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(length(t) - 2, 0) + 1),
                               i -> substr(t, i, 3))) AS g
  FROM norm
), lm AS (
  SELECT g, count(*) AS cnt FROM tg GROUP BY g
), tot AS (
  SELECT sum(cnt) AS total FROM lm
), doc AS (
  SELECT t.doc_id, count(*) AS n_trigrams, sum(l.cnt) AS s
  FROM tg t JOIN lm l ON t.g = l.g
  GROUP BY t.doc_id
)
SELECT d.doc_id, d.n_trigrams,
       CAST(d.s AS DOUBLE)
         / (CAST(d.n_trigrams AS DOUBLE) * CAST(tot.total AS DOUBLE))
         AS lm_score
FROM doc d CROSS JOIN tot
""")
def text_lm_quality(spark, sf):
    # Corpus-trained character-trigram LM score (self-scored): the
    # portable arithmetic-mean twin of CCNet's perplexity filter — all
    # integer counts until one double division, so Spark and DuckDB
    # agree bitwise. Low score = trigram distribution far from the
    # corpus = gibberish/mojibake candidate.
    from yougile_etl_pipeline_spark.operators.text import lm_quality_score
    return lm_quality_score(load_table(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# Fuzzy record linkage (operators/linkage.py::fuzzy_self_join)
# ---------------------------------------------------------------------------

@register("link_fuzzy_titles", """
WITH titles AS (
  SELECT doc_id, substr(text, 1, 30) AS title FROM documents
), toks AS (
  SELECT doc_id AS id, title AS s,
         unnest(list_distinct(string_split_regex(lower(trim(title)), ' +')))
           AS tok
  FROM titles
), dfreq AS (
  SELECT tok, count(*) AS df FROM toks GROUP BY tok
), kept AS (
  SELECT t.id, t.s, t.tok FROM toks t
  JOIN dfreq d ON t.tok = d.tok WHERE d.df <= 100
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
  FROM kept a JOIN kept b ON a.tok = b.tok AND a.id < b.id
)
SELECT id_a, id_b, levenshtein(sa, sb) AS dist
FROM cand WHERE levenshtein(sa, sb) <= 8
""")
def link_fuzzy_titles(spark, sf):
    # Record linkage on a dirty string key (here: 30-char title prefix):
    # shared-token blocking with a DF cap bounds the candidate set (the
    # near-dup lesson applied to joins), then ONE levenshtein DP per
    # candidate. Distance is an exact int -> bit-identical oracle.
    from yougile_etl_pipeline_spark.operators.linkage import fuzzy_self_join
    titles = (load_table(spark, sf, "documents")
              .select("doc_id", F.substring("text", 1, 30).alias("title")))
    return fuzzy_self_join(titles, "doc_id", "title",
                           max_dist=8, max_token_df=100)


# ---------------------------------------------------------------------------
# SCD2 dimension build (operators/quality.py::scd2_build)
# ---------------------------------------------------------------------------

@register("dim_scd2_orders", """
WITH h AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         TIMESTAMP '2024-01-01 00:00:00' AS loaded_ts
  FROM orders WHERE o_orderkey % 5 <> 0
  UNION ALL
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END,
         o_orderstatus, TIMESTAMP '2024-01-02 00:00:00'
  FROM orders
  UNION ALL
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END,
         o_orderstatus, TIMESTAMP '2024-01-03 00:00:00'
  FROM orders
), v AS (
  SELECT *,
         (lag(o_totalprice) OVER w IS DISTINCT FROM o_totalprice
          OR lag(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
          OR row_number() OVER w = 1) AS is_v
  FROM h WINDOW w AS (PARTITION BY o_orderkey ORDER BY loaded_ts)
), ver AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus, loaded_ts
  FROM v WHERE is_v
)
SELECT o_orderkey, o_totalprice, o_orderstatus,
       loaded_ts AS valid_from,
       lead(loaded_ts) OVER w2 AS valid_to,
       lead(loaded_ts) OVER w2 IS NULL AS is_current
FROM ver WINDOW w2 AS (PARTITION BY o_orderkey ORDER BY loaded_ts)
""")
def dim_scd2_orders(spark, sf):
    # SCD2 over a simulated 3-load history: load1 misses keys %5=0
    # (late arrivals), load2 doubles price for keys %7=0 (a change),
    # load3 repeats load2 (unchanged reload — must collapse, not
    # version). Exercises first-load versions, change-versions, and the
    # unchanged-collapse in one query.
    from yougile_etl_pipeline_spark.operators.quality import scd2_build
    orders = load_table(spark, sf, "orders") \
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    changed = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2)
         .otherwise(F.col("o_totalprice")))
    loads = [
        orders.filter(F.col("o_orderkey") % 5 != 0)
              .withColumn("loaded_ts", F.lit("2024-01-01 00:00:00")
                          .cast("timestamp")),
        changed.withColumn("loaded_ts", F.lit("2024-01-02 00:00:00")
                           .cast("timestamp")),
        changed.withColumn("loaded_ts", F.lit("2024-01-03 00:00:00")
                           .cast("timestamp")),
    ]
    hist = loads[0].unionByName(loads[1]).unionByName(loads[2])
    return scd2_build(hist, ["o_orderkey"],
                      ["o_totalprice", "o_orderstatus"])


# ---------------------------------------------------------------------------
# Data-quality expectations (operators/quality.py::check_expectations)
# ---------------------------------------------------------------------------

@register("quality_expectations", """
SELECT l_orderkey, l_linenumber,
       array_to_string(failed, ',') AS failed FROM (
  SELECT l_orderkey, l_linenumber,
         list_sort(list_filter([
           CASE WHEN NOT coalesce(l_quantity <= 30, FALSE)
                THEN 'qty_le_30' END,
           CASE WHEN NOT coalesce(l_discount <= 0.05, FALSE)
                THEN 'discount_le_5pct' END,
           CASE WHEN NOT coalesce(l_extendedprice > 0, FALSE)
                THEN 'price_positive' END
         ], x -> x IS NOT NULL)) AS failed
  FROM lineitem)
WHERE len(failed) > 0
""")
def quality_expectations(spark, sf):
    # Expectations runner: every row checked against ALL rules in one
    # codegen pass; violating rows surface with the sorted rule-name
    # list (the quarantine-table shape). NULL predicate results count
    # as failures on both sides (NOT coalesce(cond, FALSE)). The rule
    # list is comma-joined at the query boundary — the certification
    # driver hashes scalar cells only (CORRECTNESS_r03 lesson); the
    # operator itself keeps the typed array.
    from yougile_etl_pipeline_spark.operators.quality import (
        check_expectations,
    )
    li = load_table(spark, sf, "lineitem")
    rules = {
        "qty_le_30": F.col("l_quantity") <= 30,
        "discount_le_5pct": F.col("l_discount") <= 0.05,
        "price_positive": F.col("l_extendedprice") > 0,
    }
    return (check_expectations(li, rules)
            .filter(F.size("failed") > 0)
            .select("l_orderkey", "l_linenumber",
                    F.concat_ws(",", "failed").alias("failed")))


# ---------------------------------------------------------------------------
# Retention cohorts (events)
# ---------------------------------------------------------------------------

@register("events_retention_cohorts", """
WITH firstw AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
)
SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cohort, a.wk) / 7 AS INT) AS week_offset,
       count(*) AS n_users
FROM act a JOIN firstw f ON a.user_id = f.user_id
GROUP BY 1, 2
""")
def events_retention_cohorts(spark, sf):
    # Retention matrix: cohort = ISO week of first activity; one cell
    # per (cohort, week offset) counting distinct users active that
    # week. Two aggregations over the same user_id partitioning — the
    # standard growth-analytics rollup, exact integer offsets (both
    # engines truncate weeks to Monday so the day diff divides by 7).
    ev = load_table(spark, sf, "events")
    firstw = (ev.groupBy("user_id")
              .agg(F.date_trunc("week", F.min("ts")).alias("cohort")))
    act = (ev.select("user_id",
                     F.date_trunc("week", "ts").alias("wk")).distinct())
    return (act.join(firstw, "user_id")
            .groupBy(F.date_format("cohort", "yyyy-MM-dd")
                     .alias("cohort_week"),
                     (F.datediff("wk", "cohort") / 7).cast("int")
                     .alias("week_offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


# ---------------------------------------------------------------------------
# Gaps-and-islands interval merge (operators/relational.py::merge_intervals)
# ---------------------------------------------------------------------------

@register("events_interval_merge", """
WITH iv AS (
  SELECT o_custkey, o_orderdate AS s,
         o_orderdate + INTERVAL 30 DAY AS e
  FROM orders WHERE o_orderkey % 10 = 0
), flagged AS (
  SELECT o_custkey, s, e,
         CASE WHEN max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) IS NULL
                OR s > max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS opens
  FROM iv
), islands AS (
  SELECT o_custkey, s, e,
         sum(opens) OVER (PARTITION BY o_custkey ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS island
  FROM flagged
)
SELECT o_custkey, min(s) AS span_start, max(e) AS span_end,
       count(*) AS n_intervals
FROM islands GROUP BY o_custkey, island
""")
def events_interval_merge(spark, sf):
    # Gaps-and-islands: each order opens a 30-day activity interval per
    # customer; overlapping intervals merge into maximal activity spans.
    # Running-max (not lag) island detection so nested intervals can't
    # split a span.
    from yougile_etl_pipeline_spark.operators.relational import (
        merge_intervals,
    )
    iv = (load_table(spark, sf, "orders")
          .filter(F.col("o_orderkey") % 10 == 0)
          .select("o_custkey", F.col("o_orderdate").alias("s"),
                  (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
                  .alias("e")))
    return merge_intervals(iv, ["o_custkey"], "s", "e")


# ---------------------------------------------------------------------------
# Time-series resample + forward fill (operators/relational.py)
# ---------------------------------------------------------------------------

@register("events_resample_ffill", """
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
  FROM events GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
  FROM bounds
), hourly AS (
  SELECT user_id, h, val, n_events FROM (
    SELECT user_id, date_trunc('hour', ts) AS h, value AS val,
           count(*) OVER (PARTITION BY user_id, date_trunc('hour', ts))
             AS n_events,
           row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events)
  WHERE rn = 1
)
SELECT g.user_id, g.h,
       last_value(hh.val IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       coalesce(hh.n_events, 0) AS n_events
FROM grid g LEFT JOIN hourly hh ON g.user_id = hh.user_id AND g.h = hh.h
""")
def events_resample_ffill(spark, sf):
    # Irregular events -> regular per-user hourly panel with forward
    # fill; the survivor per bucket is the latest (ts, event_id) — a
    # total order, so the carried double is bit-deterministic. Grids
    # are bounded per key by that key's own activity span.
    from yougile_etl_pipeline_spark.operators.relational import (
        resample_ffill,
    )
    ev = load_table(spark, sf, "events")
    return resample_ffill(ev, "user_id", "ts", "value")


# ---------------------------------------------------------------------------
# PII pseudonymization (operators/quality.py::pseudonymize)
# ---------------------------------------------------------------------------

@register("quality_pseudonymize", """
SELECT substr(sha256('mart-2024:' || CAST(c_custkey AS VARCHAR)), 1, 16)
         AS c_custkey,
       substr(sha256('mart-2024:' || c_name), 1, 16) AS c_name,
       c_mktsegment,
       c_acctbal
FROM customer
""")
def quality_pseudonymize(spark, sf):
    # Salted keyed-hash surrogates: same (salt, value) -> same surrogate,
    # so the pseudonymized key still joins/aggregates across tables;
    # rotating the salt unlinks all history. sha2-256 hex is identical
    # in both engines -> oracle-paired. Map-only, no shuffle.
    from yougile_etl_pipeline_spark.operators.quality import pseudonymize
    cust = load_table(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    return pseudonymize(cust, ["c_custkey", "c_name"], salt="mart-2024")


# ---------------------------------------------------------------------------
# E5b PageRank (operators/graph.py::pagerank_fixed_point)
# ---------------------------------------------------------------------------
# Bipartite customer<->supplier trade graph from orders x lineitem; the
# oracle unrolls the 3 power iterations as chained CTEs. Every step is
# integer multiply / floor-divide (DuckDB `//` == Spark `div` on
# non-negative operands), so ranks are bit-identical across engines.

_PR_GRAPH = """
pairs AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                  's' || CAST(l_suppkey AS VARCHAR) AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL
), edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
), nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM nodes)
"""

_PR_STEP = """
s{i} AS (
  SELECT e.dst AS node, CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS s
  FROM edges e JOIN r{prev} r ON e.src = r.node
               JOIN deg d ON e.src = d.node
  GROUP BY e.dst
), r{i} AS (
  SELECT nd.node,
         CAST((15 * 1000000000000) // (100 * (SELECT n FROM nn))
              + (85 * COALESCE(s{i}.s, 0)) // 100 AS BIGINT) AS rank
  FROM nodes nd LEFT JOIN s{i} ON nd.node = s{i}.node
)"""

_PR_SQL = ("WITH " + _PR_GRAPH
           + ", r0 AS (SELECT node, CAST(1000000000000 // (SELECT n FROM nn)"
             " AS BIGINT) AS rank FROM nodes)"
           + "".join("," + _PR_STEP.format(i=i, prev=i - 1)
                     for i in (1, 2, 3))
           + "\nSELECT node, rank FROM r3")


@register("graph_pagerank", _PR_SQL)
def graph_pagerank(spark, sf):
    # Link analysis over the near-dup/reference graph surface: which
    # nodes accumulate mass. Fixed-point integer power iteration makes
    # an iterative DataFrame algorithm fully oracle-pairable.
    from yougile_etl_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )
    from yougile_etl_pipeline_spark.sources.tables import load_tables

    t = load_tables(spark, sf, ("orders", "lineitem"))
    pairs = (t["orders"]
             .join(t["lineitem"],
                   t["orders"].o_orderkey == t["lineitem"].l_orderkey)
             .filter(F.col("o_custkey").isNotNull()
                     & F.col("l_suppkey").isNotNull())
             .select(
                 F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
                  .alias("c"),
                 F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
                  .alias("s"))
             .distinct())
    edges = (pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
             .unionAll(pairs.select(F.col("s").alias("src"),
                                    F.col("c").alias("dst"))))
    return pagerank_fixed_point(edges, iterations=3)


# ---------------------------------------------------------------------------
# SCD2 point-in-time lookup (operators/quality.py::scd2_lookup)
# ---------------------------------------------------------------------------

@register("dim_scd2_lookup", """
WITH h AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         TIMESTAMP '2024-01-01 00:00:00' AS loaded_ts
  FROM orders WHERE o_orderkey % 5 <> 0
  UNION ALL
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END,
         o_orderstatus, TIMESTAMP '2024-01-02 00:00:00'
  FROM orders
), v AS (
  SELECT *,
         (lag(o_totalprice) OVER w IS DISTINCT FROM o_totalprice
          OR lag(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
          OR row_number() OVER w = 1) AS is_v
  FROM h WINDOW w AS (PARTITION BY o_orderkey ORDER BY loaded_ts)
), dim AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         loaded_ts AS valid_from,
         lead(loaded_ts) OVER w2 AS valid_to
  FROM (SELECT o_orderkey, o_totalprice, o_orderstatus, loaded_ts
        FROM v WHERE is_v)
  WINDOW w2 AS (PARTITION BY o_orderkey ORDER BY loaded_ts)
), probes AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 2 = 0
              THEN TIMESTAMP '2024-01-01 12:00:00'
              ELSE TIMESTAMP '2024-01-02 12:00:00' END AS probe_ts
  FROM orders
)
SELECT p.o_orderkey, p.probe_ts,
       d.o_totalprice AS price_asof, d.o_orderstatus AS status_asof
FROM probes p LEFT JOIN dim d
  ON p.o_orderkey = d.o_orderkey
 AND p.probe_ts >= d.valid_from
 AND (d.valid_to IS NULL OR p.probe_ts < d.valid_to)
""")
def dim_scd2_lookup(spark, sf):
    # Point-in-time ("as of") dimension lookup against the SCD2 build:
    # even keys probe day-1 noon (keys %5=0 were late arrivals -> NULL
    # attributes), odd keys probe day-2 noon (see the %7 price change).
    # Equi-hash-join on the key, interval test as residual; disjoint
    # validity intervals guarantee <=1 match so the output keeps the
    # fact grain.
    from yougile_etl_pipeline_spark.operators.quality import (
        scd2_build,
        scd2_lookup,
    )

    orders = load_table(spark, sf, "orders") \
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    changed = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2)
         .otherwise(F.col("o_totalprice")))
    hist = (orders.filter(F.col("o_orderkey") % 5 != 0)
            .withColumn("loaded_ts",
                        F.lit("2024-01-01 00:00:00").cast("timestamp"))
            .unionByName(changed.withColumn(
                "loaded_ts",
                F.lit("2024-01-02 00:00:00").cast("timestamp"))))
    dim = scd2_build(hist, ["o_orderkey"],
                     ["o_totalprice", "o_orderstatus"]) \
        .drop("is_current")
    probes = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 2 == 0,
               F.lit("2024-01-01 12:00:00"))
         .otherwise(F.lit("2024-01-02 12:00:00"))
         .cast("timestamp").alias("probe_ts"))
    out = scd2_lookup(probes, dim, ["o_orderkey"], "probe_ts")
    return out.select("o_orderkey", "probe_ts",
                      F.col("o_totalprice").alias("price_asof"),
                      F.col("o_orderstatus").alias("status_asof"))


# ---------------------------------------------------------------------------
# VARIANT semi-structured extraction (Spark 4 VariantType)
# ---------------------------------------------------------------------------

@register("events_variant_extract", """
SELECT event_id,
       json_extract_string(j, '$.et') AS et,
       CAST(json_extract(j, '$.v') AS DOUBLE) AS v,
       CAST(json_extract(j, '$.u') AS BIGINT) AS u,
       json_extract_string(j, '$.missing') AS missing_path
FROM (SELECT event_id,
             to_json(struct_pack(et := event_type, v := value,
                                 u := user_id)) AS j
      FROM events)
""")
def events_variant_extract(spark, sf):
    # The engine's schema-less semi-structured path: parse_json -> open
    # VariantType (binary-encoded, predicate-pushdown-friendly in
    # parquet) -> typed variant_get extraction; a missing path is NULL,
    # not an error. Complements events_json_flatten (per-path
    # get_json_object re-parses the string for every path; VARIANT
    # parses once). Oracle extracts the same paths with DuckDB JSON
    # functions — only the extracted typed VALUES cross engines, never
    # the engine-specific encodings.
    ev = load_table(spark, sf, "events")
    payload = F.parse_json(F.to_json(F.struct(
        F.col("event_type").alias("et"),
        F.col("value").alias("v"),
        F.col("user_id").alias("u"))))
    return (ev.select("event_id", payload.alias("vr"))
              .select(
                  "event_id",
                  F.variant_get("vr", "$.et", "string").alias("et"),
                  F.variant_get("vr", "$.v", "double").alias("v"),
                  F.variant_get("vr", "$.u", "long").alias("u"),
                  F.variant_get("vr", "$.missing", "string")
                   .alias("missing_path")))


# ---------------------------------------------------------------------------
# Incremental join maintenance (plans/incremental.py::delta_join)
# ---------------------------------------------------------------------------

@register("join_incremental_delta", """
WITH a_h AS (SELECT o_orderkey, o_custkey FROM orders
             WHERE o_orderkey % 10 <> 0),
a_d AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 10 = 0),
b_h AS (SELECT l_orderkey AS o_orderkey, l_suppkey, l_quantity
        FROM lineitem WHERE l_linenumber % 3 <> 0),
b_d AS (SELECT l_orderkey AS o_orderkey, l_suppkey, l_quantity
        FROM lineitem WHERE l_linenumber % 3 = 0),
full_j AS (
  SELECT a.o_orderkey, a.o_custkey, b.l_suppkey, b.l_quantity
  FROM (SELECT * FROM a_h UNION ALL SELECT * FROM a_d) a
  JOIN (SELECT * FROM b_h UNION ALL SELECT * FROM b_d) b
    USING (o_orderkey)),
old_j AS (
  SELECT a.o_orderkey, a.o_custkey, b.l_suppkey, b.l_quantity
  FROM a_h a JOIN b_h b USING (o_orderkey))
SELECT * FROM full_j
EXCEPT ALL
SELECT * FROM old_j
""")
def join_incremental_delta(spark, sf):
    # The rows a materialized orders⋈lineitem mart GAINS when a batch
    # lands on each side: computed via join algebra (dA⋈(B∪dB) ∪ A⋈dB)
    # — history never re-joins history, so per-load cost scales with
    # the batch. The oracle states the SEMANTICS as full-minus-old
    # (EXCEPT ALL, multiset-exact); the implementation never computes
    # either full join.
    from yougile_etl_pipeline_spark.plans.incremental import delta_join
    from yougile_etl_pipeline_spark.sources.tables import load_tables

    t = load_tables(spark, sf, ("orders", "lineitem"))
    o = t["orders"].select("o_orderkey", "o_custkey")
    li = t["lineitem"].select(F.col("l_orderkey").alias("o_orderkey"),
                              "l_suppkey", "l_quantity",
                              "l_linenumber")
    a_h = o.filter(F.col("o_orderkey") % 10 != 0)
    a_d = o.filter(F.col("o_orderkey") % 10 == 0)
    b_h = li.filter(F.col("l_linenumber") % 3 != 0).drop("l_linenumber")
    b_d = li.filter(F.col("l_linenumber") % 3 == 0).drop("l_linenumber")
    return delta_join(a_h, a_d, b_h, b_d, "o_orderkey") \
        .select("o_orderkey", "o_custkey", "l_suppkey", "l_quantity")


# Round-6 registrations import HERE (not in registry.py): they consume
# this module's oracle-SQL fragments (_CSIM, _LANG_CASE, ...), which
# are only guaranteed to exist at this point on EVERY entry path —
# including the registry_ext-first circular path, where registry.py
# executes inside our line-35 import while this module is still
# partially initialized. registry_r06's own tail guard re-rotates if
# needed.
from yougile_etl_pipeline_spark import registry_r06  # noqa: E402,F401

# Round-7 rotation (r07 start): the 12-entry bank staged in round 6
# goes live here, in the same ext-bottom position and for the same
# circular-entry-path reason as the r06 import above.
from yougile_etl_pipeline_spark import registry_r07  # noqa: E402,F401

# Round-8 rotation (r08 start): registry_r08 goes live here. The bank
# was EMPTY at r07 end, so every r08 entry is built and registered
# in-round, filling the 18 freed recert-filler slots one-for-one.
from yougile_etl_pipeline_spark import registry_r08  # noqa: E402,F401

# Round-9 wiring (r09 start): registry_r09 goes live here. The bank
# was EMPTY at r08 end (VERDICT r08 "What's missing" #3), so every
# r09 entry is built and registered in-round, each swapping one
# held-out recertification filler back into _STABLE_CERTIFIED.
from yougile_etl_pipeline_spark import registry_r09  # noqa: E402,F401

# Round-10 rotation (r10 start): the 8-entry bank staged in round 9
# goes live here, in the same ext-bottom position and for the same
# circular-entry-path reason as the imports above. Further round-10
# operators register directly into registry_r10 mid-round, each
# swapping a held-out recertification filler back into
# _STABLE_CERTIFIED one-for-one.
from yougile_etl_pipeline_spark import registry_r10  # noqa: E402,F401

# Round-11 rotation (r11 start): the ten-entry bank staged in round 10
# goes live here, in the same ext-bottom position and for the same
# circular-entry-path reason as the imports above. Further round-11
# operators register directly into registry_r11 mid-round, each
# swapping a held-out recertification filler back into
# _STABLE_CERTIFIED one-for-one.
from yougile_etl_pipeline_spark import registry_r11  # noqa: E402,F401

# Round-12 rotation (r12 start): the ten-entry bank staged in round 11
# goes live here, in the same ext-bottom position and for the same
# circular-entry-path reason as the imports above. Further round-12
# operators register directly into registry_r12 mid-round, each
# swapping a held-out recertification filler back into
# _STABLE_CERTIFIED one-for-one.
from yougile_etl_pipeline_spark import registry_r12  # noqa: E402,F401

# Round-13 rotation (r13 start): the ten-entry bank staged in round 12
# goes live here, in the same ext-bottom position and for the same
# circular-entry-path reason as the imports above. Further round-13
# operators register directly into registry_r13 mid-round, each
# swapping a held-out recertification filler back into
# _STABLE_CERTIFIED one-for-one.
from yougile_etl_pipeline_spark import registry_r13  # noqa: E402,F401

# Round-14 rotation (see registry.py's ROUND-14 ROTATION PLAN): the
# fourteen-entry bank staged and oracle-proven during round 13 goes
# live here, in the same ext-bottom position and for the same
# circular-entry-path reason as the imports above. Further round-14
# operators register directly into registry_r14 mid-round, each
# swapping a held-out recertification filler back into
# _STABLE_CERTIFIED one-for-one.
from yougile_etl_pipeline_spark import registry_r14  # noqa: E402,F401

# Round-15 rotation (see registry.py's ROUND-15 ROTATION note): the
# sixteen-entry bank staged and oracle-proven during round 14 goes
# live here, in the same ext-bottom position and for the same
# circular-entry-path reason as the imports above. Further round-15
# operators register directly into registry_r15 mid-round, each
# swapping a held-out recertification filler back into
# _STABLE_CERTIFIED one-for-one.
from yougile_etl_pipeline_spark import registry_r15  # noqa: E402,F401

# ROUND-16 WIRING (r16 rotation, registry.py tail plan): genuinely new
# operators register directly into registry_r16 mid-round, each
# swapping a held-out recertification filler back into
# _STABLE_CERTIFIED (the standing mart_abc_parts precedent).
from yougile_etl_pipeline_spark import registry_r16  # noqa: E402,F401

# Order-independence guard: if THIS module was the process's entry
# point into the engine (e.g. `from ...registry_ext import <helper>`
# before anything imported registry), the circular tail-import path
# means registry.py's end-of-module rotation already ran BEFORE the
# registrations above executed. Re-rotating here converges any import
# order to the same certification-window SET (rotation is idempotent:
# it just re-moves the stable list to the tail). In the canonical
# order (registry imported first) the attribute does not exist yet at
# this point and registry's own tail call performs the single rotation.
from yougile_etl_pipeline_spark import registry as _registry_mod

if hasattr(_registry_mod, "_rotate_certification_window"):
    _registry_mod._rotate_certification_window()
