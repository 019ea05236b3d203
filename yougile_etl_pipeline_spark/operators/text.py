"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst expressions (split / array lambdas / regexp / md5) — no
Python UDFs, so every op runs inside whole-stage codegen and scales
linearly with partitions: per-document computation, no shuffle at all
until an aggregation asks for one.

Ops: whitespace + BPE-ish tokenization, token statistics, marker-based
language ID, quality scoring, document fingerprinting (exact + shingle
min-fingerprint). These are net-new surface vs the reference (its only
string ops are replace/split, ``dags/yougile_etl_dag.py:283-284``) —
declared as north-star extensions in SURVEY.md §2.10 E3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "tokens",
    "bpe_ish_tokens",
    "token_stats",
    "language_score",
    "language_id",
    "quality_score",
    "repetition_stats",
    "bm25_scores",
    "domain_affinity",
    "collocation_lift",
    "readability_scores",
    "chunk_documents",
    "line_dedup",
    "self_dedup",
    "pack_chunks",
    "redact_pii",
    "ngram_contamination",
    "tfidf_top_terms",
    "build_vocab",
    "oov_stats",
    "dup_span_coverage",
    "dup_span_removal",
    "rake_keyphrases",
    "hashed_term_features",
    "PII_PATTERNS",
    "bpe_fertility_by_lang",
    "code_prose_profile",
    "fingerprint_exact",
    "fingerprint_shingle_min",
    "shingle_stream",
    "shingles",
    "char_trigrams",
    "train_char_lm",
    "lm_quality_score",
    "STOPWORDS",
    "LANG_MARKERS",
]

# Tiny English stopword list — deterministic, embedded (no external model).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# Marker tokens per language for the n-gram-heuristic language ID. The
# synthetic corpus is an English-ish word soup, so markers double as a
# machinery demonstration; swap marker sets for real corpora.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "und", "ist"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "la", "y", "es"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space —
# the GPT-2-style regex family, kept RE2/Java-compatible so Spark and
# DuckDB agree.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization → array<string>."""
    return F.split(_c(col), sep)


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish subword pre-tokenization via regex runs → array<string>."""
    return F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0)


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics (counts, distinct, lengths, ratios)."""
    toks = tokens(text_col)
    n = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return df.withColumns({
        "n_tokens": n,
        "n_distinct_tokens": F.size(F.array_distinct(toks)),
        "n_bpe_tokens": F.size(bpe_ish_tokens(text_col)),
        "char_len": F.length(_c(text_col)),
        # avg token length over the space-free text; double division of
        # exact ints — deterministic.
        "avg_token_len": (F.length(F.replace(_c(text_col), F.lit(" "),
                                             F.lit(""))).cast("double") / n),
        "stopword_ratio": stop.cast("double") / n,
    })


def language_score(col: Column | str, markers: list[str]) -> Column:
    """Count of marker-token hits (with multiplicity) in the text."""
    return F.size(F.filter(tokens(col), lambda t: t.isin(markers)))


def language_id(df: DataFrame, text_col: str = "text",
                out_col: str = "lang_pred") -> DataFrame:
    """Marker-frequency language ID: argmax over per-language marker hit
    counts; ties and zero evidence → 'und'. First-match-wins argmax keeps
    the choice deterministic."""
    scores = {lang: language_score(text_col, m)
              for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pick = None
    for lang, s in scores.items():  # declaration order breaks ties
        cond = (s == best) & (best > 0)
        pick = F.when(cond, lang) if pick is None else pick.when(cond, lang)
    df = df.withColumns({f"score_{lang}": s for lang, s in scores.items()})
    return df.withColumn(out_col, pick.otherwise("und"))


def quality_score(df: DataFrame, text_col: str = "text",
                  out_col: str = "quality") -> DataFrame:
    """Heuristic document quality in [0,1]: length band + stopword band +
    lexical diversity. All int/double arithmetic — deterministic."""
    toks = tokens(text_col)
    n = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    stop_ratio = (F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
                  .cast("double") / n)
    len_ok = ((n >= 20) & (n <= 1000)).cast("double")
    stop_ok = ((stop_ratio >= 0.01) & (stop_ratio <= 0.6)).cast("double")
    score = (F.lit(0.4) * len_ok + F.lit(0.3) * stop_ok
             + F.lit(0.3) * distinct_ratio)
    return df.withColumn(out_col, score)


def _ngram_starts(toks: Column, n: int) -> Column:
    """1-based start offsets of the word n-grams of `toks` — EMPTY array
    when the doc has fewer than n tokens. ``sequence(1, 0)`` is the trap:
    it yields the DESCENDING array [1, 0] and ``slice(toks, 0, n)``
    throws, so short docs crash without this guard (the DuckDB twin's
    range() is empty for stop < start and needs none)."""
    count = F.size(toks) - (n - 1)
    return F.when(count > 0, F.sequence(F.lit(1), count)) \
            .otherwise(F.array().cast("array<int>"))


def _gram_stats(df: DataFrame, id_col: str, text_col: str, n: int,
                prefix: str, *, need_distinct: bool = True) -> DataFrame:
    """(id, total n-grams[, distinct n-grams], max single-gram count) via
    explode → two codegen hash aggregations (both partially combine
    map-side; the first shuffles one (doc, gram) row per distinct gram).
    The per-row array-lambda alternative is O(distinct·total) through
    interpreted HOFs and measured ~50× slower at sf0.1 — the same
    explode-beats-HOF lesson as `minhash_signature`."""
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    df = ensure_parallelism(df)
    toks = tokens(text_col)
    if n == 1:
        ex = df.select(F.col(id_col).alias("__doc"),
                       F.explode(toks).alias("__g"))
    else:
        ex = (df.select(F.col(id_col).alias("__doc"), toks.alias("__t"),
                        F.explode(_ngram_starts(toks, n)).alias("__i"))
                .select("__doc", F.concat_ws(
                    " ", *[F.col("__t")[F.col("__i") + j - 1]
                           for j in range(n)]).alias("__g")))
    per_gram = ex.groupBy("__doc", "__g").agg(
        F.count(F.lit(1)).alias("__c"))
    aggs = [F.sum("__c").cast("int").alias(f"{prefix}_total")]
    if need_distinct:
        aggs.append(F.count(F.lit(1)).cast("int")
                    .alias(f"{prefix}_distinct"))
    aggs.append(F.max("__c").cast("int").alias(f"{prefix}_top"))
    return (per_gram.groupBy("__doc").agg(*aggs)
            .withColumnRenamed("__doc", id_col))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     *, id_col: str = "doc_id",
                     max_top_bigram_frac: float = 0.18,
                     max_dup_token_ratio: float = 0.9) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): documents
    dominated by a repeated phrase are boilerplate/spam and poison
    training data. Emits per-doc repetition signals and the keep/drop
    verdict:

    * ``dup_token_ratio`` — 1 − distinct/total tokens;
    * ``top_unigram_frac`` / ``top_bigram_frac`` — share of the token
      (resp. bigram) stream taken by its most frequent element;
    * ``repetition_ok`` — keep-verdict under the thresholds.

    Relational formulation (`_gram_stats`): explode + grouped counts,
    all codegen. Exact int counts → double division, so the SQL oracle
    reproduces every bit. Docs with zero bigrams (single-token) get NULL
    bigram stats, matching the oracle's empty-list NULLs.

    Contract: ``id_col`` must uniquely key the rows of `df` (a document
    id). Stats are computed per id — rows sharing an id would have their
    token streams pooled and each input row would receive the pooled
    stats via the join."""
    uni = _gram_stats(df, id_col, text_col, 1, "u")
    bi = _gram_stats(df, id_col, text_col, 2, "b", need_distinct=False)
    out = (df.join(uni, id_col, "left").join(bi, id_col, "left")
           .withColumns({
               "n_tokens": F.col("u_total"),
               "dup_token_ratio":
                   F.lit(1.0) - F.col("u_distinct").cast("double")
                   / F.col("u_total"),
               "top_unigram_frac":
                   F.col("u_top").cast("double") / F.col("u_total"),
               "top_bigram_frac":
                   F.col("b_top").cast("double") / F.col("b_total"),
           }))
    return (out.withColumn(
        "repetition_ok",
        (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & (F.col("dup_token_ratio") <= max_dup_token_ratio))
        .drop("u_total", "u_distinct", "u_top", "b_total", "b_top"))


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    *, chunk_size: int = 32, stride: int = 24) -> DataFrame:
    """Split documents into fixed-size token windows (the unit a training
    pipeline embeds / packs into sequences). Windows start every `stride`
    tokens (overlap = chunk_size − stride); the final window may be
    short. Output: one row per (doc, chunk) with the chunk index, text
    and exact token count.

    Per-row ``transform(sequence(...))`` + explode — no shuffle, linear
    in corpus size; at 100 TB chunking is a map-only stage that pipelines
    into whatever shuffle follows."""
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.struct(
        ((s - 1) / stride).cast("long").alias("chunk_idx"),
        F.concat_ws(" ", F.slice(toks, s, chunk_size)).alias("chunk_text"),
        F.least(F.lit(chunk_size), n - s + 1).alias("chunk_tokens"),
    ))
    return (df.select(F.col(id_col), F.explode(chunks).alias("c"))
              .select(id_col, "c.chunk_idx", "c.chunk_text",
                      "c.chunk_tokens"))


def line_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               *, seg_tokens: int = 8, min_df: int = 2) -> DataFrame:
    """Cross-document repeated-passage removal (CCNet/RefinedWeb line
    dedup): split each document into aligned `seg_tokens`-token segments
    (the "lines" of a newline-free corpus), drop every copy of any
    segment that occurs in ≥ `min_df` distinct documents (boilerplate:
    headers, navigation, license blocks), and reassemble the survivors
    in original order. Output: one row per document with the cleaned
    text and kept/dropped segment counts — docs reduced to nothing
    survive with empty text, so downstream length filters see them.

    Plan: map-only segmentation (transform+posexplode), one shuffle to
    count per-segment document frequency, a frequency join back, then a
    per-doc aggregation whose sorted-collect makes reassembly
    partition-order independent. At 100 TB the frequency shuffle carries
    a 16-byte fingerprint (md5(segment)) instead of the segment text,
    and the join back is fingerprint-keyed — identical shape to
    `fingerprint_exact` dedup; here the raw segment is the key so the
    DuckDB twin is byte-for-byte checkable."""
    toks = tokens(text_col)
    n = F.size(toks)
    n_segs = F.ceil(F.greatest(n, F.lit(1)) / F.lit(seg_tokens))
    segs_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * seg_tokens + 1, seg_tokens)))
    segs = df.select(
        F.col(id_col),
        F.posexplode(segs_arr).alias("seg_idx", "seg"))
    freq = segs.groupBy("seg").agg(
        F.count_distinct(id_col).alias("seg_df"))
    flagged = segs.join(freq, "seg").withColumn(
        "keep", F.col("seg_df") < min_df)
    ordered = F.array_sort(F.collect_list(
        F.struct("seg_idx", "keep", "seg")))
    return (flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.filter(ordered, lambda s: s.keep),
                        lambda s: s.seg), " ").alias("clean_text"),
        F.count_if(F.col("keep")).alias("n_kept"),
        F.count_if(~F.col("keep")).alias("n_dropped")))


def bm25_scores(df: DataFrame, terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                *, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 relevance of every document against a literal query term
    list — the retrieval scorer for corpus search/inspection tooling.

    Linear-idf variant: idf(t) = (N − df + 0.5)/(df + 0.5), i.e. the
    argument of BM25's ln, used directly — ln is not bit-portable
    across engines while +,×,÷ are IEEE-exact, so the oracle matches
    to the last bit (same trade `tfidf_top_terms` documents: stronger
    rare-term weighting than ln-idf, identical ordering for a fixed
    corpus). Negative-idf terms (df > N/2) keep their negative weight.

    Determinism without decimal tricks: per-term scores are summed as a
    FIXED-ORDER expression tree (term literals in input order), never a
    double aggregation — so there is no partition-order dependence to
    pin. Corpus stats (per-term df, total length — exact integers) are
    one tiny aggregation broadcast back via cross join, so the whole
    scorer stays a lazy plan (no driver collect) and every float is
    derived from exact ints by the same IEEE ops on both engines; the
    scoring pass itself is map-only over the corpus.

    `terms` must be non-empty; a duplicated term is scored (and counted
    in `n_query_terms_present`) once per occurrence, matching BM25 over
    the raw query token sequence — dedupe the list first for set
    semantics."""
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokens(text_col)
    stats = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.size(toks)).alias("__len_sum"),
        *[F.count_if(F.array_contains(toks, t)).alias(f"__df_{i}")
          for i, t in enumerate(terms)])
    x = df.crossJoin(F.broadcast(stats))
    avgdl = (F.col("__len_sum").cast("double")
             / F.col("__n").cast("double"))
    dl = F.size(toks).cast("double")
    norm = F.lit(k1) * (F.lit(1.0) - F.lit(b)
                        + F.lit(b) * dl / avgdl)
    def _eq(term):
        # one-arg lambda factory: a two-parameter lambda (even with a
        # default) would be read by F.filter as an (element, index)
        # function and compare tokens against their positions
        return lambda y: y == term

    score = F.lit(0.0)
    for i, t in enumerate(terms):
        dfc = F.col(f"__df_{i}")
        idf = ((F.col("__n") - dfc + F.lit(0.5))
               / (dfc + F.lit(0.5)))
        tf = F.size(F.filter(toks, _eq(t))).cast("double")
        score = score + idf * tf * (F.lit(k1) + F.lit(1.0)) / (tf + norm)
    n_hit = F.array_contains(toks, terms[0]).cast("int")
    for t in terms[1:]:
        n_hit = n_hit + F.array_contains(toks, t).cast("int")
    return x.select(F.col(id_col), score.alias("bm25"),
                    n_hit.cast("long").alias("n_query_terms_present"))


def self_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               *, seg_tokens: int = 8) -> DataFrame:
    """Intra-document repeated-segment removal: within each document,
    keep only the FIRST occurrence of every aligned `seg_tokens`-token
    segment (the within-doc counterpart of `line_dedup` — scraped pages
    repeat nav blocks and list items inside one document; Gopher-style
    repetition FILTERS drop the whole doc, this op salvages it).

    Entirely map-only: segmentation, first-occurrence filtering
    (higher-order `filter` with an index-bounded `array_contains`
    prefix probe) and reassembly all happen per row — ZERO shuffle, so
    at 100 TB this pipelines into whatever stage follows at scan
    speed. Per-row cost is O(segs² · seg_tokens) in the worst case;
    segs = len/seg_tokens is small for bounded documents, and the work
    is whole-stage-codegen JVM expressions, not Python."""
    toks = tokens(text_col)
    n = F.size(toks)
    n_segs = F.ceil(F.greatest(n, F.lit(1)) / F.lit(seg_tokens))
    segs_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * seg_tokens + 1, seg_tokens)))
    kept = F.filter(
        segs_arr,
        lambda s, i: ~F.array_contains(F.slice(segs_arr, F.lit(1), i), s))
    return df.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(segs_arr) - F.size(kept)).cast("long").alias("n_dropped"))


def pack_chunks(chunks: DataFrame, *, seq_tokens: int = 1024,
                part_col: str = "source",
                order_cols: tuple[str, str] = ("doc_id", "chunk_idx"),
                tokens_col: str = "chunk_tokens") -> DataFrame:
    """Assign chunks to fixed-token training sequences (GPT-style stream
    packing): within each `part_col` shard, chunks are laid end-to-end in
    `order_cols` order and sequence i covers token positions
    [i·seq_tokens, (i+1)·seq_tokens). A chunk belongs to the sequence
    where it starts; `seq_offset` is its start position within that
    sequence.

    One window per shard (running sum — exclusive, via ROWS … 1
    PRECEDING semantics). At 100 TB the shard column IS the parallelism
    unit: packing never needs a global order, only per-shard order, so
    shards (sources, date buckets) distribute across executors. Exact
    int arithmetic over a unique total order → deterministic."""
    from pyspark.sql.window import Window

    w = (Window.partitionBy(part_col)
               .orderBy(*order_cols)
               .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return (chunks.withColumn("__cum0", cum_before)
                  .withColumn("seq_id",
                              # `div`: exact integer division (float '/'
                              # loses exactness past 2^53 token streams)
                              F.expr(f"__cum0 div {seq_tokens}"))
                  .withColumn("seq_offset",
                              (F.col("__cum0") % seq_tokens).cast("long"))
                  .drop("__cum0"))


# PII patterns, kept inside the Java-regex ∩ RE2 common subset (no
# backrefs, no lookarounds; ASCII \b IS in the subset — both engines
# define it over [0-9A-Za-z_]) so Spark and DuckDB compile the SAME
# automaton — which is what makes the redaction oracle-checkable. The
# phone pattern is \b-anchored so digits inside longer runs (serial
# numbers, order ids) are neither counted nor partially redacted.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               *, out_col: str = "text_redacted") -> DataFrame:
    """Scrub PII spans (emails, phone-shaped numbers) from a text column
    — the standard pre-release step of every public-corpus pipeline
    (C4/Dolma-style regex scrubbing). Adds `out_col` with each match
    replaced by a typed placeholder (``<EMAIL>``, ``<PHONE>``) plus a
    per-type match count (counted on the ORIGINAL text, before any
    replacement).

    regexp_replace / regexp_extract_all are Catalyst expressions — the op
    is a map-only codegen stage, pipelines into the scan, zero shuffle at
    any scale."""
    c = _c(text_col)
    # regexp_count: match counting without materializing the per-row
    # array of matched substrings that regexp_extract_all would build
    counts = {
        f"n_{kind}": F.regexp_count(c, F.lit(pat)).cast("int")
        for kind, pat in PII_PATTERNS.items()
    }
    red = c
    for kind, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return df.withColumns({**counts, out_col: red})


def ngram_contamination(train: DataFrame, bench: DataFrame,
                        *, id_col: str = "doc_id", text_col: str = "text",
                        n: int = 8) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with a benchmark/eval corpus (the n-gram-overlap check
    every serious LLM data pipeline runs before training; n=13 on real
    corpora, lower here for short synthetic docs). Returns one row per
    contaminated training doc: (id, n_shared_grams = distinct benchmark
    n-grams it contains).

    Scale shape: the benchmark side is DISTINCT n-grams of the eval set —
    orders of magnitude smaller than the training corpus — so it is
    **broadcast** and the check is a map-side semi-join over the exploded
    training grams: no shuffle of training data at all; the only
    aggregation shuffles the (rare) contaminated hits. At 100 TB the
    broadcast generalizes to a bloom filter of benchmark gram hashes.

    The training side (the huge one) builds grams via the codegen
    explode(start-offsets) + GetArrayItem path — NOT the interpreted
    `transform()` HOF of `shingles()` (measured ~50× slower in
    `_gram_stats`); per-doc gram dedup happens in the count-distinct
    aggregate, not as a per-row array op. Duplicate grams surviving to
    the broadcast join are benign: the join multiplies only hits."""
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    def grams(df: DataFrame, cols: list[Column]) -> DataFrame:
        toks = tokens(text_col)
        return (df.select(*cols, toks.alias("__t"),
                          F.explode(_ngram_starts(toks, n)).alias("__i"))
                  .select(*cols, F.concat_ws(
                      " ", *[F.col("__t")[F.col("__i") + j - 1]
                             for j in range(n)]).alias("__g")))

    tg = grams(ensure_parallelism(train), [F.col(id_col)])
    bg = grams(bench, []).distinct()
    return (tg.join(F.broadcast(bg), "__g")
              .groupBy(id_col)
              .agg(F.countDistinct("__g").cast("int")
                   .alias("n_shared_grams")))


def tfidf_top_terms(df: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by **linear-idf**
    weighting: ``weight = tf · (N / df)`` over terms with ``df < N``.

    This is a deliberate variant of classical tf·idf, not a drop-in:
    ln is transcendental and not bit-portable across engines (JVM
    Math.log vs libm), so the weight uses the raw ratio — an exact IEEE
    division, hence oracle-checkable. The ranking upweights rare terms
    more aggressively than ln-idf and CAN order terms differently when
    tf varies (ln compresses the idf range; the ratio doesn't).
    Ubiquitous terms (``df == N``) — which classical idf sends to
    ln(1) = 0 but the raw ratio would score at full tf — are excluded
    so the op never crowns a stopword as a document's most
    characteristic term.

    Three codegen aggregations (tf, df, N — all map-side partial) + one
    ranking window partitioned by doc. The df side shuffles one row per
    distinct term; N is a broadcast scalar join. Ties broken by term
    string → fully deterministic."""
    from pyspark.sql.window import Window

    ex = df.select(F.col(id_col).alias("__doc"),
                   F.explode(tokens(text_col)).alias("__t"))
    tf = ex.groupBy("__doc", "__t").agg(
        F.count(F.lit(1)).cast("int").alias("tf"))
    dfreq = tf.groupBy("__t").agg(
        F.count(F.lit(1)).cast("int").alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("__n"))
    w = Window.partitionBy("__doc").orderBy(
        F.desc("weight"), F.asc("__t"))
    return (tf.join(dfreq, "__t").crossJoin(F.broadcast(n_docs))
            .filter(F.col("df") < F.col("__n"))
            .withColumn("weight",
                        F.col("tf") * (F.col("__n").cast("double")
                                       / F.col("df")))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("__doc").alias(id_col),
                    F.col("__t").alias("term"),
                    "tf", "df", "weight", "rank"))


def build_vocab(df: DataFrame, text_col: str = "text",
                *, top_v: int = 1000) -> DataFrame:
    """Corpus vocabulary: the `top_v` most frequent whitespace tokens,
    with deterministic ranking (frequency DESC, token ASC on ties).
    Output: (token, freq, rank), rank 1..V.

    Scale shape: explode → groupBy(token) partially aggregates map-side
    (the shuffle carries one row per distinct token per partition, not
    the token stream); top-V is Spark's TakeOrderedAndProject — a
    per-partition heap merged on the driver, never a global sort. The
    final rank window runs on the ≤ V surviving rows (single tiny
    partition by construction, not a scale risk)."""
    from pyspark.sql.window import Window

    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    ex = ensure_parallelism(df).select(
        F.explode(tokens(text_col)).alias("token"))
    freq = ex.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("freq"))
    top = freq.orderBy(F.col("freq").desc(), F.col("token")).limit(top_v)
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def oov_stats(df: DataFrame, vocab: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document out-of-vocabulary rate against a (small) vocabulary
    DataFrame carrying a `token` column — the standard pre-training
    coverage check (a high OOV share flags encoding junk, boilerplate,
    or the wrong language for the target tokenizer).

    Output: (id, n_tokens, n_oov, oov_rate) with ``oov_rate = n_oov /
    n_tokens`` (exact int counts → one IEEE division, oracle-exact).
    The vocab is broadcast (top-V by construction — even a 1M-token
    vocab is a few MB), so the token stream is never shuffled for the
    join; the per-doc aggregate partially combines map-side."""
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    ex = ensure_parallelism(df).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    v = F.broadcast(vocab.select("token").withColumn("__v", F.lit(1)))
    j = ex.join(v, "token", "left")
    return (j.groupBy(id_col)
             .agg(F.count(F.lit(1)).cast("int").alias("n_tokens"),
                  F.count_if(F.col("__v").isNull()).cast("int")
                   .alias("n_oov"))
             .withColumn("oov_rate",
                         F.col("n_oov").cast("double") / F.col("n_tokens")))


def fingerprint_exact(col: Column | str) -> Column:
    """Exact-dedup fingerprint: md5 of whitespace-normalized lowercase text.
    md5 is identical across engines → oracle-checkable; at 100 TB the
    fingerprint is the shuffle key (16 bytes, uniformly distributed — no
    skew)."""
    norm = F.lower(F.regexp_replace(_c(col), " +", " "))
    return F.md5(norm)


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the text → array<string>.

    Pure array lambda: ``transform(starts, i -> concat_ws(' ',
    slice(tokens, i, n)))`` — per-row, no shuffle; empty (not a crash)
    for docs shorter than n tokens (see `_ngram_starts`)."""
    toks = tokens(col)
    sh = F.transform(_ngram_starts(toks, n),
                     lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(sh)


def shingle_stream(df: DataFrame, id_col: str, text_col: str,
                   n: int = 3) -> DataFrame:
    """Exploded (id, shingle) word n-gram stream — the CODEGEN
    formulation (explode a position sequence + GetArrayItem +
    concat_ws), NOT `shingles`'s interpreted `transform` lambda, which
    measured ~55% of total query time in the minhash path (see
    `dedup.minhash_signature`'s plan note, where this shape originates).

    Duplicates are NOT removed: consumers that are duplicate-
    insensitive (min-debut, distinct-count aggregates) get the same
    answer as over the distinct set while the stream itself stays
    whole-stage-codegen; callers that need per-doc distinct shingles
    should aggregate, not re-introduce the per-row lambda. Emits no
    rows for docs shorter than n tokens (matching `shingles`' empty
    array)."""
    toks = F.split(F.col(text_col), " ")
    n_pos = F.size(toks) - (n - 1)
    offsets = F.when(n_pos > 0, F.sequence(F.lit(0), n_pos - 1)) \
               .otherwise(F.array().cast("array<int>"))
    return (df.select(F.col(id_col), toks.alias("__t"),
                      F.explode(offsets).alias("__i"))
              .select(id_col, F.concat_ws(
                  " ", *[F.col("__t")[F.col("__i") + j]
                         for j in range(n)]).alias("sh")))


def fingerprint_shingle_min(col: Column | str, n: int = 3) -> Column:
    """Rolling-hash-style fingerprint: lexicographic min of the md5s of the
    document's n-gram shingles (a 1-permutation MinHash). Robust to
    appends/prepends unlike `fingerprint_exact`."""
    return F.array_min(F.transform(shingles(col, n), F.md5))


# ---------------------------------------------------------------------------
# Corpus-trained character-trigram LM quality score
# ---------------------------------------------------------------------------

def char_trigrams(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """One row per character trigram occurrence (WITH multiplicity) of the
    whitespace-normalized lowercase text — the stream both LM training
    and scoring consume.

    ``explode(sequence) + substring`` keeps the whole expansion in
    codegen (same lesson as the MinHash shingler); the sequence is
    guarded because Spark's ``sequence(1, 0)`` counts DOWN instead of
    returning empty."""
    norm = F.lower(F.regexp_replace(F.col(text_col), " +", " "))
    df = df.select(F.col(id_col), norm.alias("__t"))
    starts = F.when(
        F.length("__t") >= 3,
        F.sequence(F.lit(1), F.length("__t") - 2),
    ).otherwise(F.array().cast("array<int>"))
    return (df.select(F.col(id_col), "__t",
                      F.explode(starts).alias("__i"))
              .select(F.col(id_col),
                      F.expr("substring(__t, __i, 3)").alias("g")))


def train_char_lm(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Unigram LM over character trigrams: (g, cnt). Map-side partial
    aggregation collapses the trigram stream before the shuffle; the
    model itself is bounded by charset³ (a few hundred thousand rows for
    text — broadcastable at ANY corpus size, which is what makes scoring
    below join-cheap at 100 TB)."""
    return (char_trigrams(docs, id_col, text_col)
            .groupBy("g").agg(F.count(F.lit(1)).alias("cnt")))


def lm_quality_score(docs: DataFrame, lm: DataFrame | None = None,
                     *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """CCNet-style LM quality signal: per-document mean corpus frequency
    of its character trigrams.

    ``score = Σ_t cnt(t) / (n_doc_trigrams × total_corpus_trigrams)`` —
    gibberish/mojibake/binary-ish text is made of trigrams the corpus
    rarely produces and scores orders of magnitude below clean prose.
    The formulation is the arithmetic-mean twin of perplexity chosen for
    portability: every term is an exact integer until ONE double
    division, so the score is bit-identical in any engine (no ln()
    last-ulp drift). Low score ⇒ filter candidate.

    Plan at 100 TB: LM is broadcast (bounded by charset³ — see
    `train_char_lm`), so scoring is scan → explode → broadcast-join →
    partial agg: one shuffle of (doc_id, n, s) rows, no corpus rescans.
    Self-scoring (lm=None) trains on `docs` itself first."""
    tg = char_trigrams(docs, id_col, text_col)
    if lm is None:
        lm = tg.groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))
    total = lm.agg(F.sum("cnt").alias("__total"))
    per_doc = (tg.join(F.broadcast(lm), "g")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_trigrams"),
                    F.sum("cnt").alias("__s")))
    # each factor is cast to double BEFORE the product: n × total can
    # exceed int64 at corpus scale (1e7-trigram doc × 1e13-trigram
    # corpus ≈ 1e20) and non-ANSI Spark would wrap silently. Both
    # factors are individually < 2^53 so each conversion is exact and
    # the product/division are single correctly-rounded ops — still
    # bit-identical across engines.
    return (per_doc.crossJoin(F.broadcast(total))
            .select(
                F.col(id_col), "n_trigrams",
                (F.col("__s").cast("double")
                 / (F.col("n_trigrams").cast("double")
                    * F.col("__total").cast("double")))
                .alias("lm_score")))


def domain_affinity(df: DataFrame, target: DataFrame, *,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Data-selection affinity of every document to a target domain —
    the DSIR-family shape (Xie et al. 2023: importance resampling on
    cheap n-gram features), reduced to exact arithmetic so it is
    bit-portable.

    Features are each document's DISTINCT whitespace tokens. With
    document frequencies df_target(t) (over the `target` subset — the
    "what I want more of" sample) and df_raw(t) (over `df`), the score
    is a ratio of two masses summed over the doc's features:

        affinity = Σ df_target(t)  /  Σ df_raw(t)

    Both masses are exact integer sums (order-independent — no float
    accumulation), divided ONCE in IEEE double; documents whose
    vocabulary concentrates in target-typical tokens score toward
    |target|/|corpus|·k, out-of-domain documents toward 0. This is the
    sufficient-statistics reduction of DSIR's per-feature
    log-likelihood ratio (same trick as `agg_sufficient_stats` /
    `bm25_scores`' linear idf): monotone-aligned for ranking and
    sampling cutoffs, while staying oracle-pairable — an ln-based
    product of per-token ratios cannot be.

    Output: ``(id_col, n_feats, tgt_mass, raw_mass, affinity)``, one
    row per document of `df`.

    Scale: explode distinct tokens (map-only), two token-keyed
    document-frequency aggregations, one equi-join of the feature
    stream against each (vocab-sized relations — broadcastable when
    the vocabulary is bounded; at open-web scale hash tokens into 2²⁰
    buckets first, exactly DSIR's hashed-feature move, and these joins
    stay bounded too), then one groupBy(doc). No driver collects."""
    feats = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
    tgt_feats = target.select(
        F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
    raw_df = feats.groupBy("tok").agg(F.count(F.lit(1)).alias("__rdf"))
    tgt_df = tgt_feats.groupBy("tok").agg(F.count(F.lit(1)).alias("__tdf"))
    scored = (feats.join(raw_df, "tok")
                   .join(tgt_df, "tok", "left"))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_feats"),
                 F.sum(F.coalesce(F.col("__tdf"), F.lit(0)))
                  .alias("tgt_mass"),
                 F.sum("__rdf").alias("raw_mass"))
            .withColumn("affinity",
                        F.col("tgt_mass") / F.col("raw_mass")))


def collocation_lift(df: DataFrame, *, text_col: str = "text",
                     min_pair_count: int = 5) -> DataFrame:
    """Corpus collocation mining: adjacent token pairs ranked by LIFT —
    the ln-free twin of PMI (Church & Hanks' association ratio without
    the log), so "new york"-style multiword units surface while
    chance co-occurrences of frequent words score ~1.

        lift(a,b) = p(a,b) / (p(a)·p(b))
                  = (c_ab / N_pairs) / ((c_a / N_tok) · (c_b / N_tok))

    All counts are exact integers (order-independent sums); the score
    is ONE fixed float expression over them —
    ``c_ab·N_tok·N_tok / (N_pairs·c_a·c_b)`` evaluated in double with
    the numerator/denominator association written identically in the
    SQL oracle — so output is bit-portable. (PMI = ln(lift): identical
    ranking, but ln isn't bit-portable across engines — the
    `bm25_scores` linear-idf trade.)

    Output: ``(tok_a, tok_b, c_ab, c_a, c_b, lift)`` for pairs with
    ``c_ab >= min_pair_count`` (the support floor that keeps the
    result corpus-stable and the output bounded).

    Scale: bigram + unigram counting are partial-agg shuffles bounded
    by vocab²/vocab; the two count joins are vocab-keyed equi-joins
    (broadcastable for bounded vocabularies); corpus totals are a
    one-row broadcast via cross join (the `bm25_scores` pattern — the
    whole plan stays lazy, no driver collect). The TOKENIZED relation
    feeds three consumers (bigram counts, unigram counts, corpus
    totals) and is persisted through the bounded plan-keyed LRU
    `_cache_gram_stream` so the parquet scan + split run once, not
    three times (r14: 3.27 s → measured post-change in BENCH_r14; at
    cluster scale the same reuse is a staging table)."""
    from yougile_etl_pipeline_spark.sources.tables import (
        ensure_parallelism,
    )

    df = ensure_parallelism(df)
    toks = tokens(text_col)
    base = _cache_gram_stream(df.select(toks.alias("__t")))
    starts = F.when(F.size("__t") > 1,
                    F.sequence(F.lit(1), F.size("__t") - 1)) \
              .otherwise(F.array().cast("array<int>"))
    big = (base.select("__t", F.explode(starts).alias("__i"))
               .select(F.element_at("__t", F.col("__i")).alias("tok_a"),
                       F.element_at("__t", F.col("__i") + 1)
                        .alias("tok_b")))
    c_ab = (big.groupBy("tok_a", "tok_b")
               .agg(F.count(F.lit(1)).alias("c_ab"))
               .filter(F.col("c_ab") >= min_pair_count))
    uni = (base.select(F.explode("__t").alias("tok"))
               .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    stats = base.agg(F.sum(F.size("__t")).alias("__n_tok"),
                     F.sum(F.greatest(F.size("__t") - 1, F.lit(0)))
                      .alias("__n_pairs"))
    scored = (c_ab
              .join(uni.select(F.col("tok").alias("tok_a"),
                               F.col("c").alias("c_a")), "tok_a")
              .join(uni.select(F.col("tok").alias("tok_b"),
                               F.col("c").alias("c_b")), "tok_b")
              .crossJoin(F.broadcast(stats)))
    nt = F.col("__n_tok").cast("double")
    lift = (F.col("c_ab").cast("double") * nt * nt
            / (F.col("__n_pairs").cast("double")
               * F.col("c_a").cast("double")
               * F.col("c_b").cast("double")))
    return scored.select("tok_a", "tok_b", "c_ab", "c_a", "c_b",
                         lift.alias("lift"))


def skipgram_cooccurrence(df: DataFrame, *, text_col: str = "text",
                          skips: tuple[int, ...] = (2, 3),
                          min_pair_count: int = 5) -> DataFrame:
    """Window co-occurrence lift at skip distances `skips` — the
    non-adjacent complement of `collocation_lift` (d = 1): phrase
    templates ("new ____ times"), split named entities and
    collocations spanning a stopword all co-occur at distance 2-3
    while never being adjacent. Same ln-free lift as collocations,
    over the skip-pair event space:

        lift(a,b) = (c_ab / N_sp) / ((c_a / N_tok) · (c_b / N_tok))

    with N_sp = Σ_docs Σ_d max(len − d, 0) — exact integer counts,
    ONE fixed float expression, bit-portable (the collocation_lift
    association rule; numerator/denominator written identically in
    the SQL twin).

    Scale: one tokenized relation feeding len(skips) positional
    explodes + unigram counts + corpus totals — persisted through the
    plan-keyed `_cache_gram_stream` LRU, so it is scanned once AND
    shared with a collocation_lift over the same input (identical
    base plan). Pair/unigram aggregations are vocab²/vocab-bounded
    partial-agg shuffles; totals ride a one-row broadcast.

    Output: ``(tok_a, tok_b, c_ab, c_a, c_b, lift)`` for skip pairs
    with ``c_ab >= min_pair_count``."""
    from yougile_etl_pipeline_spark.sources.tables import (
        ensure_parallelism,
    )

    df = ensure_parallelism(df)
    toks = tokens(text_col)
    base = _cache_gram_stream(df.select(toks.alias("__t")))
    legs = []
    for d in skips:
        starts = F.when(F.size("__t") > d,
                        F.sequence(F.lit(1), F.size("__t") - d)) \
                  .otherwise(F.array().cast("array<int>"))
        legs.append(
            base.select("__t", F.explode(starts).alias("__i"))
                .select(F.element_at("__t", F.col("__i")).alias("tok_a"),
                        F.element_at("__t", F.col("__i") + d)
                         .alias("tok_b")))
    sp = legs[0]
    for leg in legs[1:]:
        sp = sp.unionByName(leg)
    c_ab = (sp.groupBy("tok_a", "tok_b")
              .agg(F.count(F.lit(1)).alias("c_ab"))
              .filter(F.col("c_ab") >= min_pair_count))
    uni = (base.select(F.explode("__t").alias("tok"))
               .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    n_sp = None
    for d in skips:
        term = F.greatest(F.size("__t") - d, F.lit(0))
        n_sp = term if n_sp is None else n_sp + term
    stats = base.agg(F.sum(F.size("__t")).alias("__n_tok"),
                     F.sum(n_sp).alias("__n_sp"))
    scored = (c_ab
              .join(uni.select(F.col("tok").alias("tok_a"),
                               F.col("c").alias("c_a")), "tok_a")
              .join(uni.select(F.col("tok").alias("tok_b"),
                               F.col("c").alias("c_b")), "tok_b")
              .crossJoin(F.broadcast(stats)))
    nt = F.col("__n_tok").cast("double")
    lift = (F.col("c_ab").cast("double") * nt * nt
            / (F.col("__n_sp").cast("double")
               * F.col("c_a").cast("double")
               * F.col("c_b").cast("double")))
    return scored.select("tok_a", "tok_b", "c_ab", "c_a", "c_b",
                         lift.alias("lift"))


def readability_scores(df: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Flesch-style readability per document — the classic
    surface-statistics quality lens (complements the stopword/length
    `quality_score` and the trigram `lm_quality_score`):

        flesch = 206.835 − 1.015·(words/sentences)
                         − 84.6·(syllable_groups/words)

    Heuristic inputs, exactly countable on both engines: words =
    whitespace tokens; sentences = runs of [.!?] (floored at 1 so
    punctuation-free text scores rather than dividing by zero);
    syllable groups = maximal vowel runs ``[aeiouy]+`` in the
    lowercased text — the standard syllable proxy. All three are
    integer regexp counts (Java∩RE2-safe patterns, the `redact_pii`
    portability rule); the score is ONE fixed float expression over
    them, so output is bit-portable. Map-only codegen — no shuffle,
    no UDF."""
    t = _c(text_col)
    words = F.size(tokens(text_col))
    sentences = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), 0)))
    syl = F.size(F.regexp_extract_all(F.lower(t),
                                      F.lit("[aeiouy]+"), 0))
    flesch = (F.lit(206.835)
              - F.lit(1.015) * (words.cast("double")
                                / sentences.cast("double"))
              - F.lit(84.6) * (syl.cast("double")
                               / words.cast("double")))
    return df.select(F.col(id_col),
                     words.alias("n_words"),
                     sentences.alias("n_sentences"),
                     syl.alias("n_syllable_groups"),
                     flesch.alias("flesch"))


# Bounded LRU cache for the exploded positional-gram stream shared by
# the dup-span/collocation operators (the dedup.py _LAST_SHINGLE_CACHE
# precedent): the stream feeds BOTH the fingerprint-frequency/debut
# aggregation and the join-back probe side, and without a persist each
# consumer re-runs the explode+md5 scan — measured 29.4 s → 3.8 s at
# the 10× sf1 probe (slope 8.0 → 2.4, round 14). At cluster scale the
# same reuse is a staging table or shuffle reuse; MEMORY_AND_DISK is
# the local equivalent.
#
# Keyed by logical-plan semantics (ADVICE r14: the old SINGLE slot was
# shared by collocation_lift, dup_span_coverage and dup_span_removal,
# so a composed query that built two of these — e.g. the cap-audit's
# exact+capped removal twins — evicted the earlier persist BEFORE the
# job ran, silently reintroducing the duplicate explode+md5 scans):
# a `sameSemantics` hit returns the ALREADY-PERSISTED DataFrame, so
# twins that derive the same gram stream now share one persist instead
# of stacking two identical ones; misses evict beyond 3 slots, oldest
# first (in-flight consumers of an evicted result just recompute).
# Single-threaded query construction is assumed, as everywhere in this
# engine — the registry builds plans sequentially; the cache is not
# guarded against concurrent construction.
_GRAM_CACHE_SLOTS = 3
_LAST_GRAM_CACHE: list[DataFrame] = []


def _cache_gram_stream(ex: DataFrame) -> DataFrame:
    for cached in _LAST_GRAM_CACHE:
        if cached.sameSemantics(ex):
            _LAST_GRAM_CACHE.remove(cached)
            _LAST_GRAM_CACHE.append(cached)  # refresh LRU position
            return cached
    ex = ex.persist()
    _LAST_GRAM_CACHE.append(ex)
    while len(_LAST_GRAM_CACHE) > _GRAM_CACHE_SLOTS:
        _LAST_GRAM_CACHE.pop(0).unpersist(blocking=False)
    return ex


def dup_span_coverage(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 5,
                      max_gram_df: int | None = None) -> DataFrame:
    """Per-document coverage by CROSS-document duplicated word
    n-grams — the exact-substring dedup signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"):
    a token position is *covered* when it sits inside an n-gram that
    also occurs in at least one OTHER document; a high covered
    fraction marks boilerplate and near-copies that MinHash's
    whole-doc lens can miss.

    Distinct from `text_ngram_novelty` (debut-ordered distinct
    trigrams): this is positional — overlapping duplicated grams merge
    into spans and each token is counted once, so ``coverage`` is the
    true fraction of removable duplicated text.

    Distributed shape: positional grams carry a 16-byte md5
    fingerprint, never the gram text, so the frequency shuffle is
    fingerprint-sized; grams seen in ≥ 2 distinct docs join back
    (equi-join on the fingerprint); then ONE shuffle on the doc id
    collects each doc's duplicated start offsets and the span union is
    pure array math — ``array_distinct(flatten(transform(starts, s →
    sequence(s, s+n−1))))`` — inside codegen, no (doc, position)
    distinct shuffle. Every doc gets a row (left join; zero coverage
    when nothing is duplicated).

    Considered and rejected: folding the join-back away by carrying a
    ``collect_list((doc, start))`` payload through the frequency
    aggregation measures ~30% faster at sf0.1 (one exploded-gram pass
    instead of two) but concentrates a hot gram's ENTIRE occurrence
    list into one aggregation buffer — at web scale a boilerplate
    n-gram present in a few percent of documents is exactly the skew
    case this operator exists to find, and the join-back form streams
    it through normal shuffle machinery instead of materializing it.

    ``max_gram_df`` (default off — exact Lee-et-al semantics) is the
    escape hatch against ADVERSARIAL duplication (VERDICT r11 #4: a
    corpus whose text is copied wholesale makes the duplicated-span
    workload itself grow with the duplication): a gram duplicated
    across MORE than `max_gram_df` distinct documents is obviously
    corpus-scale boilerplate, so any document containing one is
    counted FULLY covered (n_covered = n_tokens — the upper bound a
    dedup pipeline would act on anyway) WITHOUT enumerating that
    gram's occurrences through the positional span machinery; only
    grams in the honest 2..cap band pay for exact span unions. The
    hot flag rides the SAME join-back and doc-keyed aggregation (a
    hot occurrence contributes a null to the partial collect_list and
    flips a max() flag — map-side collapsible), so a duplication
    attack degrades to the unavoidable linear fingerprint scan
    instead of corpus-sized span arrays.

    Returns ``(id_col, n_tokens, n_covered, coverage)``."""
    from yougile_etl_pipeline_spark.sources.tables import (
        ensure_parallelism,
    )

    df = ensure_parallelism(df)
    toks = tokens(text_col)
    gram = F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__s"), n))
    ex = (df.select(F.col(id_col),
                    F.explode(_ngram_starts(toks, n)).alias("__s"),
                    toks.alias("__toks"))
            .select(id_col, "__s", F.md5(gram).alias("__fp"))
            .repartition("__fp"))
    ex = _cache_gram_stream(ex)
    counts = (ex.groupBy("__fp")
                .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
                .filter(F.col("__nd") >= 2))
    if max_gram_df is None:
        starts = (ex.join(counts.select("__fp"), "__fp")
                    .groupBy(id_col)
                    .agg(F.collect_list("__s").alias("__starts"),
                         F.lit(0).alias("__hot")))
    else:
        flagged = counts.select(
            "__fp", (F.col("__nd") > max_gram_df).alias("__is_hot"))
        starts = (ex.join(flagged, "__fp")
                    .groupBy(id_col)
                    .agg(F.collect_list(
                            F.when(~F.col("__is_hot"), F.col("__s")))
                         .alias("__starts"),
                         F.max(F.col("__is_hot").cast("int"))
                         .alias("__hot")))
    covered = starts.select(
        id_col,
        F.size(F.array_distinct(F.flatten(F.transform(
            "__starts",
            lambda s: F.sequence(s, s + (n - 1))))))
        .cast("bigint").alias("n_covered"),
        "__hot")
    base = df.select(F.col(id_col),
                     F.size(toks).cast("bigint").alias("n_tokens"))
    out = base.join(covered, id_col, "left")
    n_cov = F.coalesce(F.col("n_covered"), F.lit(0).cast("bigint"))
    n_cov = F.when(F.col("__hot") == 1, F.col("n_tokens")) \
        .otherwise(n_cov)
    return out.select(
        id_col, "n_tokens",
        n_cov.alias("n_covered"),
        (n_cov.cast("double") / F.col("n_tokens").cast("double"))
        .alias("coverage"))


def dup_span_source_pairs(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", n: int = 5,
                          *, max_gram_df: int = 50,
                          min_shared: int = 3) -> DataFrame:
    """Who-copied-whom attribution for exact-substring duplication:
    for each duplicated word n-gram, the DEBUT document (smallest id
    — the deterministic "original" under the same keep-first policy
    `dup_span_removal` applies) is paired with every later document
    containing it, and pairs sharing ≥ `min_shared` distinct grams
    are emitted with the shared count. The per-doc coverage/removal
    lenses say HOW MUCH is duplicated; this says BETWEEN WHOM — the
    provenance readout behind crawl-overlap and syndication audits
    (the survivorship matrix's near-dup analogue, at n-gram rather
    than whole-document granularity).

    The df-cap here is MANDATORY (the idf_weighted_jaccard rule): a
    gram in d documents yields d−1 pairs, so corpus-scale boilerplate
    would make the pair relation quadratic; grams above `max_gram_df`
    distinct docs are dropped (they attribute nothing — boilerplate
    has no single source).

    Distributed shape: the positional gram stream (shared through the
    plan-keyed `_cache_gram_stream` LRU with coverage/removal over
    the same input) reduces to DISTINCT (doc, fp) — 16-byte md5
    fingerprints shuffle, never gram text; one fp-keyed stats agg
    (count distinct docs + min doc), one fp equi-join back, one
    pair-keyed count. Returns ``(src_doc, dst_doc, shared_grams)``."""
    from yougile_etl_pipeline_spark.sources.tables import (
        ensure_parallelism,
    )

    df = ensure_parallelism(df)
    toks = tokens(text_col)
    gram = F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__s"), n))
    ex = (df.select(F.col(id_col),
                    F.explode(_ngram_starts(toks, n)).alias("__s"),
                    toks.alias("__toks"))
            .select(id_col, "__s", F.md5(gram).alias("__fp"))
            .repartition("__fp"))
    ex = _cache_gram_stream(ex)
    exd = ex.select(id_col, "__fp").distinct()
    st = (exd.groupBy("__fp")
             .agg(F.count(F.lit(1)).cast("bigint").alias("__nd"),
                  F.min(F.col(id_col)).alias("__debut"))
             .filter((F.col("__nd") >= 2)
                     & (F.col("__nd") <= max_gram_df)))
    return (exd.join(st, "__fp")
               .filter(F.col(id_col) != F.col("__debut"))
               .groupBy(F.col("__debut").alias("src_doc"),
                        F.col(id_col).alias("dst_doc"))
               .agg(F.count(F.lit(1)).cast("bigint")
                     .alias("shared_grams"))
               .filter(F.col("shared_grams") >= min_shared))


def rake_keyphrases(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", *,
                    stopwords: list[str] | None = None,
                    min_count: int = 2) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate
    phrases are maximal stopword-free token runs; each word scores
    degree/frequency (degree = summed length of the phrases it
    appears in — co-occurrence reach; frequency = its occurrence
    count), and a phrase scores the sum of its words' scores — the
    unsupervised topical-phrase miner for corpus exploration and
    dictionary bootstrap.

    Portability: deg and freq are exact int64 counts; the word score
    is integer ppm (``deg·10⁶ div freq`` — the `benford_profile`
    trick) and phrase scores are int64 sums of those, so the output
    carries no engine-dependent float at all. Identical phrase TEXT
    always has an identical score (word stats are corpus-level), so
    the final phrase-level grouping is well-defined.

    Distributed shape: one pos-explode; segment ids from a running
    stopword count (one shuffle on the doc id; the phrase-length
    window reuses the same clustering); word stats are a vocab-keyed
    partial agg joined back on the token (broadcastable for bounded
    vocabularies); phrase assembly is ``string_agg``-ordered inside
    the doc-keyed aggregation. Empty tokens (double spaces) act as
    boundaries, like stopwords.

    Returns ``(phrase, n_words, n_occurrences, score_ppm)`` for
    phrases occurring ≥ `min_count` times."""
    stops = STOPWORDS if stopwords is None else stopwords
    toks = tokens(text_col)
    toked = df.select(F.col(id_col).alias("__id"),
                      F.posexplode(toks).alias("__pos", "__tok"))
    is_stop = (F.col("__tok").isin(stops)
               | (F.col("__tok") == F.lit("")))
    w_run = (Window.partitionBy("__id").orderBy("__pos")
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
    seg = F.sum(is_stop.cast("int")).over(w_run)
    words = (toked.withColumn("__seg", seg)
                  .filter(~is_stop)
                  .select("__id", "__seg", "__pos", "__tok"))
    w_phrase = Window.partitionBy("__id", "__seg")
    words = words.withColumn(
        "__plen", F.count(F.lit(1)).over(w_phrase))
    wstats = (words.groupBy("__tok")
                   .agg(F.count(F.lit(1)).alias("__freq"),
                        F.sum("__plen").alias("__deg"))
                   .withColumn("__wppm",
                               F.expr("__deg * 1000000 div __freq")))
    scored = words.join(wstats.select("__tok", "__wppm"), "__tok")
    phrases = (scored.groupBy("__id", "__seg")
               .agg(F.concat_ws(" ", F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("__pos", "__tok"))),
                        lambda x: x["__tok"])).alias("phrase"),
                    F.count(F.lit(1)).alias("__nw"),
                    F.sum("__wppm").alias("__score")))
    return (phrases.groupBy("phrase")
            .agg(F.max("__nw").cast("bigint").alias("n_words"),
                 F.count(F.lit(1)).alias("n_occurrences"),
                 # identical phrase text ⇒ identical score by
                 # construction; max is just the scalar extractor
                 F.max("__score").alias("score_ppm"))
            .filter(F.col("n_occurrences") >= min_count))


def hashed_term_features(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", *,
                         dims: int = 64) -> DataFrame:
    """Feature-hashing (hashing-trick) term vectorizer: sparse
    per-document term-frequency counts folded into a FIXED `dims`
    bucket space — the vocabulary-free featurization for streaming
    classifiers and dedup prefilters (no vocab build, no OOV concept,
    memory bounded by construction).

    Bucket = int64 of the md5 prefix mod dims — the engine-portable
    `hash_bucket` trick, identical in the SQL oracle (Spark's
    murmur-based ``hash()`` is NOT portable). Collisions are the
    accepted trade of the method and deterministic here. Output is
    the SPARSE triple form ``(id_col, bucket, tf)`` — only touched
    buckets appear — which joins/aggregates naturally at scale;
    densify per consumer, never in the engine.

    Scale: explode + ONE (doc, bucket) partial-agg shuffle whose
    width is capped at dims rows per doc, regardless of document
    length or vocabulary growth."""
    if dims < 1:
        raise ValueError("dims must be >= 1")
    toks = tokens(text_col)
    ex = (df.select(F.col(id_col), F.explode(toks).alias("__tok"))
            .filter(F.col("__tok") != ""))
    bucket = (F.conv(F.substring(F.md5(F.col("__tok")), 1, 8), 16, 10)
              .cast("long") % dims)
    return (ex.groupBy(id_col, bucket.alias("bucket"))
              .agg(F.count(F.lit(1)).alias("tf")))


def dup_span_removal(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n: int = 5,
                     max_gram_df: int | None = None) -> DataFrame:
    """The actionable form of `dup_span_coverage`: REMOVE every token
    position covered by an n-gram that debuted in an EARLIER document
    (min id owns the span; later occurrences are the duplicates) —
    Lee et al. 2022's exact-substring deduplication as an executable
    rewrite, not just a score.

    Keep/drop rule, fully deterministic: a position is dropped iff
    some n-gram window over it also occurs in a document with a
    smaller id. The debut document always keeps its text; a gram
    repeated only WITHIN one document is untouched (`self_dedup` is
    the intra-doc lens). Rebuilt text joins the surviving tokens with
    single spaces.

    Distributed shape: same fingerprint-keyed debut aggregation and
    join-back as `dup_span_coverage` (16-byte md5 shuffles, equi-join
    back, ONE doc-keyed shuffle to assemble each doc's removable
    spans); the rebuild is per-row array math on the SORTED covered
    set — kept positions are the complement, materialized as the gap
    sequences between consecutive covered positions (sort + one
    linear zip + one element_at gather), O(tokens + covered·log
    covered) per doc. The r06 shape tested ``array_contains`` per
    token — O(tokens · covered), quadratic on pathological documents
    (VERDICT r06 #2); output is bit-identical.

    ``max_gram_df`` (default off — exact Lee-et-al semantics) is the
    same ADVERSARIAL-duplication escape hatch as
    `dup_span_coverage`'s (VERDICT r13 #2: the actionable variant
    must carry the knob its scoring sibling has — same debut-join
    shape, same boilerplate-gram skew exposure at 100×): a gram
    duplicated across MORE than `max_gram_df` distinct documents is
    corpus-scale boilerplate, so any NON-DEBUT document containing
    one is removed WHOLE (``n_removed = n_tokens``,
    ``clean_text = ''`` — the action a dedup pipeline would take on
    wholesale-copied text anyway) WITHOUT enumerating that gram's
    occurrences through the positional span machinery; only grams in
    the honest 2..cap band pay for exact span unions. The debut
    document still always keeps its text. The hot flag rides the SAME
    join-back and doc-keyed aggregation (a hot occurrence contributes
    a null to the partial collect_list and flips a max() flag —
    map-side collapsible), so a duplication attack degrades to the
    unavoidable linear fingerprint scan instead of corpus-sized span
    arrays.

    Returns ``(id_col, n_tokens, n_removed, clean_text)`` for EVERY
    input doc."""
    from yougile_etl_pipeline_spark.sources.tables import (
        ensure_parallelism,
    )

    df = ensure_parallelism(df)
    toks = tokens(text_col)
    gram = F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__s"), n))
    ex = (df.select(F.col(id_col),
                    F.explode(_ngram_starts(toks, n)).alias("__s"),
                    toks.alias("__toks"))
            .select(id_col, "__s", F.md5(gram).alias("__fp"))
            .repartition("__fp"))
    ex = _cache_gram_stream(ex)
    if max_gram_df is None:
        debut = ex.groupBy("__fp").agg(
            F.min(F.col(id_col)).alias("__debut"))
        removable = (ex.join(debut, "__fp")
                       .filter(F.col("__debut") < F.col(id_col))
                       .groupBy(id_col)
                       .agg(F.collect_list("__s").alias("__starts"),
                            F.lit(0).alias("__hot")))
    else:
        debut = ex.groupBy("__fp").agg(
            F.min(F.col(id_col)).alias("__debut"),
            F.count_distinct(F.col(id_col)).alias("__nd"))
        flagged = debut.select(
            "__fp", "__debut",
            (F.col("__nd") > max_gram_df).alias("__is_hot"))
        removable = (ex.join(flagged, "__fp")
                       .filter(F.col("__debut") < F.col(id_col))
                       .groupBy(id_col)
                       .agg(F.collect_list(
                                F.when(~F.col("__is_hot"),
                                       F.col("__s")))
                            .alias("__starts"),
                            F.max(F.col("__is_hot").cast("int"))
                            .alias("__hot")))
    covered = removable.select(
        id_col,
        F.array_distinct(F.flatten(F.transform(
            "__starts",
            lambda s: F.sequence(s, s + (n - 1))))).alias("__cov"),
        "__hot")
    base = df.select(F.col(id_col), toks.alias("__toks"))
    out = (base.join(covered, id_col, "left")
               .withColumn("__cov",
                           F.coalesce(F.col("__cov"),
                                      F.array().cast("array<int>")))
               .withColumn("__hot",
                           F.coalesce(F.col("__hot"), F.lit(0))))
    # Sorted-gaps complement: with the covered positions sorted and
    # fenced by sentinels 0 and n_tokens+1, the kept positions are
    # exactly the integers strictly inside each consecutive pair —
    # flatten those gap sequences and gather the tokens by position.
    bounds = F.concat(F.array(F.lit(0)),
                      F.array_sort("__cov"),
                      F.array(F.size("__toks") + 1))
    gaps = F.zip_with(
        F.slice(bounds, F.lit(1), F.size(bounds) - 1),
        F.slice(bounds, F.lit(2), F.size(bounds) - 1),
        lambda a, b: F.when(b - a >= 2, F.sequence(a + 1, b - 1))
                      .otherwise(F.array().cast("array<int>")))
    kept_pos = F.flatten(gaps)
    is_hot = F.col("__hot") == 1
    n_toks = F.size("__toks").cast("bigint")
    return out.select(
        id_col,
        n_toks.alias("n_tokens"),
        F.when(is_hot, n_toks)
         .otherwise(F.size("__cov").cast("bigint")).alias("n_removed"),
        F.when(is_hot, F.lit(""))
         .otherwise(F.concat_ws(" ", F.transform(
             kept_pos, lambda p: F.element_at(F.col("__toks"), p))))
         .alias("clean_text"))


def code_prose_profile(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       code_ppm_threshold: int = 20_000) -> DataFrame:
    """Code-vs-prose surface profile — the corpus-routing filter that
    decides whether a document goes through the code or natural-
    language cleaning path (symbol-dense text breaks prose heuristics
    like stopword ratios and sentence splitting).

    Pure integer counts over character classes (all codegen, map-only):
    symbol chars (non-alphanumeric, non-space) and code-punctuation
    chars (``{}();=<>[]``), each as a length difference after
    `regexp_replace` deletion — identical RE2-safe character classes in
    the SQL oracle. Densities are integer ppm via truncating division
    (both operands non-negative, so Spark's toward-zero `div` and
    DuckDB's flooring ``//`` agree), and the code flag is an integer
    compare — no floats anywhere. Empty docs profile as 0/not-code."""
    t = F.col(text_col)
    n_chars = F.length(t)
    counts = df.select(
        F.col(id_col),
        n_chars.cast("int").alias("n_chars"),
        (n_chars - F.length(F.regexp_replace(t, "[^A-Za-z0-9 ]", "")))
        .cast("int").alias("n_symbols"),
        (n_chars - F.length(F.regexp_replace(t, "[{}();=<>\\[\\]]", "")))
        .cast("int").alias("n_code_punct"))
    # `div` (not `/` + floor): integer division stays in int64 — the
    # float quotient can round UP to an integer and floor() one past
    # the true value. Operands non-negative, so Spark's toward-zero
    # div == DuckDB's flooring //.
    sym_ppm = F.when(
        F.col("n_chars") > 0,
        F.expr("div(CAST(n_symbols AS BIGINT) * 1000000, n_chars)")) \
        .otherwise(F.lit(0)).cast("bigint")
    code_ppm = F.when(
        F.col("n_chars") > 0,
        F.expr("div(CAST(n_code_punct AS BIGINT) * 1000000, n_chars)")) \
        .otherwise(F.lit(0)).cast("bigint")
    return counts.select(
        id_col, "n_chars", "n_symbols", "n_code_punct",
        sym_ppm.alias("symbol_ppm"),
        code_ppm.alias("code_punct_ppm"),
        (sym_ppm >= code_ppm_threshold).alias("is_code_like"))


def bpe_fertility_by_lang(df: DataFrame, lang_col: str = "lang",
                          text_col: str = "text") -> DataFrame:
    """Tokenizer fertility per language: BPE-ish tokens emitted per
    whitespace word, the standard "how expensive is this language for
    the tokenizer" diagnostic that drives sampling-mix corrections.

    One map-side token count pass (reuses `token_stats`' codegen
    column expressions) + one language-grain aggregate of exact int64
    sums; fertility is the single closing double division, written
    identically in the oracle. Docs with zero whitespace tokens still
    count toward ``n_docs`` but add nothing to either sum."""
    toks = tokens(text_col)
    per_doc = df.select(
        F.col(lang_col).alias("lang"),
        F.size(toks).cast("bigint").alias("__n_tok"),
        F.size(bpe_ish_tokens(text_col)).cast("bigint").alias("__n_bpe"))
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__n_tok").alias("total_tokens"),
        F.sum("__n_bpe").alias("total_bpe_tokens"))
    return agg.select(
        "lang", "n_docs", "total_tokens", "total_bpe_tokens",
        F.when(F.col("total_tokens") > 0,
               F.col("total_bpe_tokens").cast("double")
               / F.col("total_tokens").cast("double"))
         .alias("fertility"))


def kwic_concordance(df: DataFrame, id_col: str, text_col: str,
                     keyword: str, *, window: int = 2) -> DataFrame:
    """Keyword-in-context (KWIC) concordance — every occurrence of
    ``keyword`` as a whitespace token, with up to ``window`` tokens of
    left and right context joined back into strings. The classic
    corpus-linguistics view ("show me how this term is used") and the
    human-review surface behind blocklist tuning and PII-pattern
    triage.

    Distributed shape: MAP-ONLY — tokenize, posexplode the position
    sequence, filter to the keyword, and slice the SAME token array
    for context (no self-join on positions, no window function, no
    shuffle at all); at 100 TB this runs as a single scan-project
    stage. Context shorter than ``window`` at document edges truncates
    naturally (``slice`` with a zero/overrun length clamps).

    Returns (id, pos, left_ctx, right_ctx) with ``pos`` the 0-based
    token position; empty context is the empty string (matching
    ``concat_ws`` semantics — oracle note: DuckDB's
    ``array_to_string([])`` is NULL, COALESCE it).
    """
    toks = df.select(F.col(id_col),
                     F.split(F.col(text_col), " ").alias("__toks"))
    hits = (toks.select(
        id_col,
        F.posexplode("__toks").alias("pos", "__tok"),
        "__toks")
        .filter(F.col("__tok") == keyword))
    # slice() is 1-based: left covers 0-based [pos-window, pos) ->
    # start max(pos-window,0)+1, length min(pos,window); right covers
    # (pos, pos+window] -> start pos+2, clamped by slice itself.
    left = F.slice("__toks",
                   F.greatest(F.col("pos") - window, F.lit(0)) + 1,
                   F.least(F.col("pos"), F.lit(window)))
    right = F.slice("__toks", F.col("pos") + 2, window)
    return hits.select(
        id_col, "pos",
        F.concat_ws(" ", left).alias("left_ctx"),
        F.concat_ws(" ", right).alias("right_ctx"))
