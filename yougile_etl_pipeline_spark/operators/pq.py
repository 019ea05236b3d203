"""Product quantization (PQ) for embedding search — the memory path of
IVF-PQ, the standard billion-vector ANN layout.

Why this exists at 100 TB: int8 scalar quantization (operators/
quantize.py) buys 4× over float32; PQ buys 32–64×. Each vector is split
into ``m`` subvectors; each subspace gets its own ``k``-centroid
codebook; a vector is stored as ``m`` small integer codes (one byte
each for k ≤ 256) plus nothing else. Search uses asymmetric distance
computation (ADC): the query stays full-precision, per-subspace
distances from the query to every codebook centroid are computed ONCE
(an m×k lookup table per query), and each corpus vector's approximate
distance is just the sum of m table lookups — no float math per corpus
row at scan time.

Distributed shapes (all relational, no all-pairs, no driver loops):

* **train** (`pq_train`): per-subspace Lloyd iterations. Assignment is
  a broadcast join of subvectors against the (m·k)-row codebook with a
  grouped struct-min argmin (map-side combinable — the exchange
  carries one row per (vector, subspace), not per centroid pair);
  the mean step shuffles (sub_id, code, pos) partial sums — ∝ m·k·dim
  after combine, corpus-size-independent. Means go through
  DECIMAL(20,9) so training is partition-order-independent and
  engine-portable, same contract as `similarity.kmeans_update`.
* **encode** (`pq_encode`): one broadcast-join argmin pass; output is
  (id, codes array) — map-side-combined, one shuffle keyed on id.
* **search** (`pq_adc_topk`): the per-query lookup tables (|Q|·m·k
  rows — tiny: queries × 4 × 16 here) broadcast against the exploded
  corpus codes; the per-(query, vector) ADC distance is a SUM over
  exactly m joined rows, accumulated in DECIMAL so ranking is
  partition-order-free; top-k per query via row_number with id
  tie-break. At 100 TB the exploded-codes join is the scan-shaped
  stage: it reads m small ints per vector, and the only wide shuffle
  carries (query_id, id, partial sum) rows that map-side combine to
  one row per pair — the corpus embeddings themselves never move.
  Compose with IVF (`similarity.ivf_assign`) to probe only nprobe
  centroid lists instead of the full corpus.

Determinism contract (oracle-pairable, same rules as registry.py):
subvector slicing is positional; argmin ties break on the smaller
code id via struct-min; ADC sums run in DECIMAL(27,12) (the double →
decimal rounding of each per-subspace distance is tie-free, decimal
addition is associative); top-k carries the id as a total-order
tie-break. Distances are squared-L2 — PQ's standard metric; each
per-pair distance is one fixed-shape IEEE expression, bit-identical
across engines.

No reference twin (the reference has no vector ops — SURVEY.md §2.10);
E2 similarity-search extension family, staged for round-6 registry
certification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "pq_split",
    "pq_seed_codebooks",
    "pq_train",
    "pq_encode",
    "pq_adc_topk",
    "ivfpq_topk",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def l2sq(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance between two equal-length arrays — one
    fixed-shape HOF expression (zip_with then left-fold), IEEE-identical
    across engines for identical inputs."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)


def pq_split(df: DataFrame, m: int, *, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """(id, vec) → (id, sub_id, subvec): positional split into `m`
    equal contiguous subvectors (dim must divide by m — enforced
    per-row by the slice arithmetic going out of bounds otherwise).
    Map-only; sub_id ∈ [0, m).

    Every PQ stage downstream fans m×k distance evaluations per row,
    so the split rides the ensure_parallelism guard (no-op whenever
    the scan already has cluster-scale splits — the r14 collapsed-
    splits lesson, SCALE.md §Round 14)."""
    from yougile_etl_pipeline_spark.sources.tables import (
        ensure_parallelism,
    )

    df = ensure_parallelism(df)
    sub = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub_id")
    base = (df.select(_c(id_col).alias(id_col),
                      _c(vec_col).alias("__v"))
            .select(id_col, "__v", sub))
    width = (F.size(F.col("__v")) / m).cast("int")
    return base.select(
        id_col, "sub_id",
        F.slice("__v", F.col("sub_id") * width + 1, width)
         .alias("subvec"))


def pq_seed_codebooks(corpus: DataFrame, *, m: int, k: int,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Deterministic codebook seeds: per subspace, the subvectors of
    the `k` smallest vector ids → (sub_id, code, cvec), code ∈ [0, k).
    Id-order seeding is reproducible at any partitioning (the k-means++
    alternative needs a random stream); Lloyd iterations wash out seed
    quality for codebook-sized k."""
    sub = pq_split(corpus, m, id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("sub_id").orderBy(F.col(id_col))
    return (sub.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select("sub_id", (F.col("__rn") - 1).alias("code"),
                    F.col("subvec").alias("cvec")))


def _pq_assign(sub: DataFrame, codebooks: DataFrame,
               id_col: str) -> DataFrame:
    """Nearest codebook entry per (vector, subspace): broadcast the
    (m·k)-row codebook, equi-join on sub_id, grouped struct-min argmin
    (d2 first, code as tie-break → deterministic)."""
    scored = (sub.join(F.broadcast(codebooks), "sub_id")
              .select(id_col, "sub_id", "code",
                      l2sq("subvec", "cvec").alias("d2")))
    best = scored.groupBy(id_col, "sub_id").agg(
        F.min(F.struct("d2", "code")).alias("b"))
    return best.select(id_col, "sub_id", F.col("b.code").alias("code"),
                       F.col("b.d2").alias("d2"))


def pq_train(corpus: DataFrame, *, m: int = 4, k: int = 16,
             iters: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Train per-subspace codebooks: id-order seeds, then `iters` Lloyd
    rounds (assign via `_pq_assign`, DECIMAL per-dimension means).
    Returns (sub_id, code, cvec); codes that attract no vectors drop
    out (codebook may shrink, exactly like `kmeans_train`). Centroid
    tables are localCheckpointed per round — m·k·(dim/m) doubles, tiny
    — to keep lineage O(1) in rounds."""
    sub = pq_split(corpus, m, id_col=id_col, vec_col=vec_col)
    books = pq_seed_codebooks(corpus, m=m, k=k,
                              id_col=id_col, vec_col=vec_col)
    for _ in range(iters):
        assigned = _pq_assign(sub, books, id_col)
        flat = (assigned.join(sub, [id_col, "sub_id"])
                .select("sub_id", "code",
                        F.posexplode("subvec").alias("pos", "val")))
        n = F.count(F.lit(1))
        means = (flat.groupBy("sub_id", "code", "pos")
                 .agg((F.sum(F.col("val").cast("double")
                              .cast("decimal(20,9)")).cast("double") / n)
                      .alias("mean_val")))
        books = (means.groupBy("sub_id", "code")
                 .agg(F.array_sort(
                     F.collect_list(F.struct("pos", "mean_val")))
                     .alias("__s"))
                 .select("sub_id", "code",
                         F.transform("__s", lambda x: x["mean_val"])
                          .alias("cvec"))
                 .localCheckpoint(eager=True))
    return books


def pq_encode(corpus: DataFrame, codebooks: DataFrame, *,
              m: int = 4, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, vec) → (id, codes): the PQ compressed representation —
    codes[sub] = argmin_code ||subvec − cvec||², array ordered by
    sub_id. One broadcast-join argmin + one id-keyed collect."""
    sub = pq_split(corpus, m, id_col=id_col, vec_col=vec_col)
    best = _pq_assign(sub, codebooks, id_col)
    return (best.groupBy(id_col)
            .agg(F.array_sort(F.collect_list(F.struct("sub_id", "code")))
                 .alias("__s"))
            .select(id_col,
                    F.transform("__s", lambda x: x["code"].cast("int"))
                     .alias("codes")))


def pq_adc_topk(corpus_codes: DataFrame, queries: DataFrame,
                codebooks: DataFrame, *, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id: str = "query_id") -> DataFrame:
    """Asymmetric-distance top-k: for each query, the k corpus vectors
    with the smallest summed per-subspace distance to the query's
    full-precision subvectors. Returns (query_id, match_id, adc_dist2,
    rank) — adc_dist2 as double (the DECIMAL accumulation is internal
    ranking state).

    The per-query distance tables (|Q|·m·k rows) broadcast; corpus
    codes explode to (id, sub_id, code) and equi-join the tables; the
    DECIMAL sum over the m matched rows map-side combines to one row
    per (query, vector). ADC is an approximation — compose with an
    exact rerank over the top-R (R > k) candidates when recall
    requirements are strict, same pattern as `lsh_bucket_topk`."""
    m = _m_of(codebooks)  # m·k driver rows — codebook-sized, bounded
    qsub = pq_split(queries, m, id_col=query_id, vec_col=vec_col)
    qtab = (qsub.join(F.broadcast(codebooks), "sub_id")
            .select(query_id, "sub_id", "code",
                    l2sq("subvec", "cvec").cast("decimal(27,12)")
                    .alias("qd2")))
    exploded = corpus_codes.select(
        id_col, F.posexplode("codes").alias("sub_id", "code"))
    scored = (exploded.join(F.broadcast(qtab), ["sub_id", "code"])
              .groupBy(query_id, id_col)
              .agg(F.sum("qd2").alias("__d")))
    w = Window.partitionBy(query_id).orderBy(
        F.col("__d"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, F.col(id_col).alias("match_id"),
                    F.col("__d").cast("double").alias("adc_dist2"),
                    "rank"))


def _m_of(codebooks: DataFrame) -> int:
    """m = number of subspaces in a codebook table (tiny: m·k rows)."""
    return codebooks.agg(F.countDistinct("sub_id")).collect()[0][0]


def ivfpq_topk(corpus: DataFrame, queries: DataFrame,
               centroids: DataFrame, codebooks: DataFrame, *,
               k: int = 5, nprobe: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               query_id: str = "query_id") -> DataFrame:
    """IVF-PQ: the full billion-vector layout — coarse quantizer
    restricts each query to `nprobe` centroid lists, PQ codes + ADC
    rank within the probed lists. Per-query work drops from |corpus|
    code lookups to ~nprobe·|corpus|/|centroids|.

    Distributed shape: corpus list assignment (one row per vector —
    at scale this is precomputed once and the code table is WRITTEN
    partitioned by centroid_id, so probing is partition pruning, not
    a join); query probes are |Q|·nprobe rows broadcast; the
    candidate restriction is an equi-join on centroid_id; ADC then
    proceeds exactly as `pq_adc_topk` but over the candidate pairs
    only. Same determinism contract (DECIMAL sums, id tie-breaks).

    Recall factors multiply: coarse-probe recall (nprobe/|centroids|
    trade) × ADC shortlist quality — measure both, the bench pattern
    `sim_ivf_topk`/`pq_adc_topk` established."""
    from yougile_etl_pipeline_spark.operators.similarity import (
        ivf_assign,
    )

    m = _m_of(codebooks)
    c_assign = ivf_assign(corpus, centroids, id_col=id_col,
                          vec_col=vec_col, nprobe=1) \
        .select(id_col, "centroid_id")
    codes = pq_encode(corpus, codebooks, m=m,
                      id_col=id_col, vec_col=vec_col)
    # ivf_assign reads its id/vec columns under the caller's names on
    # BOTH sides — realias the centroid table for the query-side call
    q_cent = centroids.select(_c(id_col).alias(query_id),
                              _c(vec_col).alias(vec_col))
    q_probe = ivf_assign(queries, q_cent, id_col=query_id,
                         vec_col=vec_col, nprobe=nprobe) \
        .select(query_id, "centroid_id")
    cand = (c_assign.join(F.broadcast(q_probe), "centroid_id")
            .select(query_id, id_col))
    qsub = pq_split(queries, m, id_col=query_id, vec_col=vec_col)
    qtab = (qsub.join(F.broadcast(codebooks), "sub_id")
            .select(query_id, "sub_id", "code",
                    l2sq("subvec", "cvec").cast("decimal(27,12)")
                    .alias("qd2")))
    exploded = codes.join(cand, id_col).select(
        query_id, id_col,
        F.posexplode("codes").alias("sub_id", "code"))
    scored = (exploded.join(F.broadcast(qtab),
                            [query_id, "sub_id", "code"])
              .groupBy(query_id, id_col)
              .agg(F.sum("qd2").alias("__d")))
    w = Window.partitionBy(query_id).orderBy(
        F.col("__d"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, F.col(id_col).alias("match_id"),
                    F.col("__d").cast("double").alias("adc_dist2"),
                    "rank"))
