"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring how ANN is deployed on real pipelines:

* **Brute-force cosine top-k** — correctness baseline and the right
  answer for small query sets: broadcast the queries, scan the corpus
  once, per-partition partial top-k, global top-k via window. Cost is
  |Q|·|corpus| dot products, embarrassingly parallel, zero shuffle until
  the final (tiny) top-k.
* **Random-hyperplane LSH buckets** — the scale path: each vector maps
  to a sign-bit bucket key from a FIXED projection matrix (seeded,
  embedded as literals so the DuckDB oracle computes identical buckets);
  candidates = bucket collisions, reranked by exact cosine. Corpus-side
  bucketing is precomputable and storable (partition/bucket by key), so
  queries touch only matching buckets — the IVF idea, relationally.

Dot products accumulate left-to-right in double on both engines
(empirically bit-exact vs DuckDB's ``list_dot_product`` — see
tests/test_similarity.py), which is what makes an exact value-hash
oracle possible for floating-point ANN at all.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "brute_force_topk",
    "hyperplanes",
    "HYPERPLANES",
    "hyperplane_bucket",
    "lsh_bucket_topk",
    "hyperplane_bucket_sql",
    "ivf_assign",
    "ivf_topk",
]

EMBED_DIM = 64
# Multi-table LSH: L tables × P planes. For near-orthogonal neighbors
# (angle θ), one table's recall is (1-θ/π)^P; L independent tables lift it
# to 1-(1-p)^L. The 4×4 default is sized for the test corpus (16 buckets/
# table, ~30 vecs each). Both are per-call arguments everywhere below: at
# scale, raise P with corpus size (expected bucket occupancy is N/2^P —
# P ≈ log2(N / target_bucket_size) keeps buckets bounded as N grows) and
# raise L to recover recall.
N_TABLES = 4
PLANES_PER_TABLE = 4


@lru_cache(maxsize=None)
def hyperplanes(n_tables: int = N_TABLES,
                planes_per_table: int = PLANES_PER_TABLE,
                seed: int = 20260101) -> tuple:
    """Seeded random hyperplanes for (n_tables, planes_per_table) —
    deterministic per sizing, identical in Spark and the SQL oracle
    (regenerating from the same seed is part of the public contract).
    The default sizing reproduces the original fixed HYPERPLANES."""
    rng = np.random.RandomState(seed)
    return tuple(
        tuple(tuple(round(float(x), 6) for x in rng.randn(EMBED_DIM))
              for _ in range(planes_per_table))
        for _ in range(n_tables)
    )


# Back-compat alias: the default-sized plane set.
HYPERPLANES = hyperplanes()


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order double dot product of two array columns."""
    prods = F.zip_with(_c(a).cast("array<double>"), _c(b).cast("array<double>"),
                       lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     *, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query vector.

    `queries` is broadcast (small by assumption); the corpus is scanned
    once. Ranking key is (cosine DESC, corpus id) — a total order, so
    top-k is deterministic. Self-matches are excluded.
    """
    from pyspark.sql.window import Window

    # norms once per side, one dot per pair (same IEEE values as cosine())
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("q_vec"),
                                   l2_norm(vec_col).alias("q_norm")))
    c = corpus.select(F.col(id_col).alias("match_id"),
                      F.col(vec_col).alias("c_vec"),
                      l2_norm(vec_col).alias("c_norm"))
    scored = (q.crossJoin(c)
               .filter(F.col("query_id") != F.col("match_id"))
               .select("query_id", "match_id",
                       (dot("q_vec", "c_vec")
                        / (F.col("q_norm") * F.col("c_norm")))
                       .alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("match_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= k))


def hyperplane_bucket(vec_col: Column | str, table: int,
                      *, n_tables: int = N_TABLES,
                      planes_per_table: int = PLANES_PER_TABLE) -> Column:
    """Sign-bit bucket key for one LSH table: one char per hyperplane
    ('1' if dot>0 else '0'), concatenated. String key → join-friendly,
    storable, identical in the SQL oracle."""
    bits = [
        F.when(dot(vec_col, F.array(*[F.lit(v) for v in plane])) > 0,
               F.lit("1")).otherwise(F.lit("0"))
        for plane in hyperplanes(n_tables, planes_per_table)[table]
    ]
    return F.concat(*bits)


def hyperplane_bucket_sql(vec_expr: str, table: int,
                          *, n_tables: int = N_TABLES,
                          planes_per_table: int = PLANES_PER_TABLE) -> str:
    """The DuckDB-SQL twin of `hyperplane_bucket` for the oracle."""
    bits = []
    for plane in hyperplanes(n_tables, planes_per_table)[table]:
        lit = "[" + ", ".join(f"{v!r}" for v in plane) + "]::DOUBLE[]"
        bits.append(
            f"(CASE WHEN list_dot_product({vec_expr}::DOUBLE[], {lit}) > 0 "
            f"THEN '1' ELSE '0' END)"
        )
    return " || ".join(bits)


def _bucketed(df: DataFrame, id_alias: str, vec_alias: str,
              id_col: str, vec_col: str,
              n_tables: int, planes_per_table: int) -> DataFrame:
    """(id, vec) → one row per LSH table with its bucket key."""
    tables = F.array(*[
        F.struct(F.lit(t).alias("tbl"),
                 hyperplane_bucket(vec_col, t, n_tables=n_tables,
                                   planes_per_table=planes_per_table)
                 .alias("key"))
        for t in range(n_tables)
    ])
    return df.select(F.col(id_col).alias(id_alias),
                     F.col(vec_col).alias(vec_alias),
                     F.explode(tables).alias("b")) \
             .select(id_alias, vec_alias,
                     F.col("b.tbl").alias("tbl"), F.col("b.key").alias("key"))


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    *, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    n_tables: int = N_TABLES,
                    planes_per_table: int = PLANES_PER_TABLE) -> DataFrame:
    """ANN top-k: candidates = bucket collision in ANY of the L hash
    tables, deduplicated, reranked by exact cosine. Recall < 1 by design;
    the scale win is that candidate generation is an equi-join on
    (table, key) instead of a cross join — at 100 TB the corpus is
    written bucketed/partitioned by the key and each query probes L
    buckets. Sizing is per-call: `planes_per_table` bounds expected bucket
    occupancy at N/2^P (raise with corpus size), `n_tables` buys recall."""
    from pyspark.sql.window import Window

    cb = _bucketed(corpus, "match_id", "c_vec", id_col, vec_col,
                   n_tables, planes_per_table) \
        .withColumn("c_norm", l2_norm("c_vec"))
    qb = F.broadcast(
        _bucketed(queries, "query_id", "q_vec", id_col, vec_col,
                  n_tables, planes_per_table)
        .withColumn("q_norm", l2_norm("q_vec")))
    cand = (qb.join(cb, ["tbl", "key"])
              .filter(F.col("query_id") != F.col("match_id"))
              .select("query_id", "q_vec", "q_norm",
                      "match_id", "c_vec", "c_norm")
              .dropDuplicates(["query_id", "match_id"]))
    scored = cand.select("query_id", "match_id",
                         (dot("q_vec", "c_vec")
                          / (F.col("q_norm") * F.col("c_norm")))
                         .alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("match_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# Batched numpy scoring — the Arrow fast path for candidate scoring
# ---------------------------------------------------------------------------
#
# The HOF dot product (`dot()` above) is exact but interpreted per element;
# scoring |Q|·N pairs through it dominates similarity cost. The fast path:
# score with one numpy matmul per Arrow batch (SIMD, ~10-100× the HOF
# throughput), keep per-batch top-k per query, then RE-SCORE only the
# ≤ k·|Q| winners with the exact HOF expression. numpy's reduction order
# differs from the sequential HOF sum by ~1 ulp, which is far below the
# score gaps between distinct random vectors — so the winner SET matches
# the exact path, and the re-scored output is bit-identical to the
# all-HOF formulation (verified: tests/test_dedup_similarity.py).

def _np_batch_topk(q_ids: np.ndarray, Q: np.ndarray, q_norms: np.ndarray,
                   ids: np.ndarray, C: np.ndarray, k: int):
    """Top-k (approx score) of one corpus batch against all queries.
    Returns (query_id, match_id, approx, batch_row_index) arrays."""
    c_norms = np.linalg.norm(C, axis=1)
    S = (Q @ C.T) / (q_norms[:, None] * c_norms[None, :])
    out_q, out_m, out_s, out_i = [], [], [], []
    for qi in range(len(q_ids)):
        row = np.where(ids == q_ids[qi], -np.inf, S[qi])
        top = min(k, len(row))
        idx = np.argpartition(-row, top - 1)[:top]
        keep = idx[np.isfinite(row[idx])]
        out_q.append(np.full(len(keep), q_ids[qi]))
        out_m.append(ids[keep])
        out_s.append(row[keep])
        out_i.append(keep)
    return (np.concatenate(out_q), np.concatenate(out_m),
            np.concatenate(out_s), np.concatenate(out_i))


def brute_force_topk_np(corpus: DataFrame, queries: DataFrame, k: int = 5,
                        *, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k per query — numpy-scored, HOF-reranked.

    Same contract and (on distinct-score data) same bits as
    `brute_force_topk`; the full |Q|·N scoring runs as one matmul per
    Arrow batch instead of interpreted HOF pairs. Queries are collected
    to the driver (small by assumption — the same rows `brute_force_topk`
    broadcasts). Winning candidates carry their vectors out of the scorer,
    so the corpus is scanned exactly once."""
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        return brute_force_topk(corpus, queries, k,
                                id_col=id_col, vec_col=vec_col)
    q_ids = np.array([r[0] for r in q_rows])
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_norms = np.linalg.norm(Q, axis=1)

    id_type = dict(corpus.dtypes)[id_col]
    vec_type = dict(corpus.dtypes)[vec_col]
    out_schema = (f"query_id {id_type}, match_id {id_type}, "
                  f"approx double, c_vec {vec_type}")

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            C = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            oq, om, os_, oi = _np_batch_topk(q_ids, Q, q_norms, ids, C, k)
            yield pd.DataFrame({
                "query_id": oq, "match_id": om, "approx": os_,
                "c_vec": pdf[vec_col].to_numpy()[oi],
            })

    cand = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    return _exact_rerank(cand, queries, k, id_col=id_col, vec_col=vec_col)


def _exact_rerank(cand: DataFrame, queries: DataFrame, k: int,
                  *, id_col: str, vec_col: str) -> DataFrame:
    """Global top-k over numpy-scored candidates, re-scored with the exact
    HOF cosine (bit-identical to the all-HOF path). `cand` must carry
    (query_id, match_id, approx, c_vec); it is tiny (≤ k·|Q| rows per
    upstream partition), so both the window and the query join are cheap."""
    from pyspark.sql.window import Window

    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("match_id"))
    winners = (cand.withColumn("__rn", F.row_number().over(wa))
                   .filter(F.col("__rn") <= k)
                   .drop("__rn"))
    qv = F.broadcast(queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm")))
    exact = (winners.join(qv, "query_id")
             .select("query_id", "match_id",
                     (dot("q_vec", "c_vec")
                      / (F.col("q_norm") * l2_norm("c_vec")))
                     .alias("cos_sim")))
    we = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("match_id"))
    return (exact.withColumn("rank", F.row_number().over(we).cast("long"))
                 .filter(F.col("rank") <= k))


def lsh_bucket_topk_np(corpus: DataFrame, queries: DataFrame, k: int = 5,
                       *, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       n_tables: int = N_TABLES,
                       planes_per_table: int = PLANES_PER_TABLE) -> DataFrame:
    """`lsh_bucket_topk` with the candidate rerank numpy-scored.

    Candidate generation (bucket equi-join + pair dedup) is identical;
    the per-pair HOF dot product is replaced by a vectorized batch dot,
    with the exact HOF re-score of the ≤ k·|Q| winners."""
    import pandas as pd

    cb = _bucketed(corpus, "match_id", "c_vec", id_col, vec_col,
                   n_tables, planes_per_table)
    qb = F.broadcast(
        _bucketed(queries, "query_id", "q_vec", id_col, vec_col,
                  n_tables, planes_per_table))
    cand = (qb.join(cb, ["tbl", "key"])
              .filter(F.col("query_id") != F.col("match_id"))
              .select("query_id", "q_vec", "match_id", "c_vec")
              .dropDuplicates(["query_id", "match_id"]))

    id_type = dict(corpus.dtypes)[id_col]
    vec_type = dict(corpus.dtypes)[vec_col]
    out_schema = (f"query_id {id_type}, match_id {id_type}, "
                  f"approx double, c_vec {vec_type}")

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf["q_vec"]])
            C = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf["c_vec"]])
            approx = np.einsum("ij,ij->i", Q, C) / (
                np.linalg.norm(Q, axis=1) * np.linalg.norm(C, axis=1))
            out = pd.DataFrame({
                "query_id": pdf["query_id"].to_numpy(),
                "match_id": pdf["match_id"].to_numpy(),
                "approx": approx,
                "c_vec": pdf["c_vec"].to_numpy(),
            })
            # per-batch top-k per query bounds what the global window sees
            out = (out.sort_values(["query_id", "approx", "match_id"],
                                   ascending=[True, False, True])
                      .groupby("query_id", sort=False).head(k))
            yield out

    scored = cand.mapInPandas(score, out_schema)
    return _exact_rerank(scored, queries, k, id_col=id_col, vec_col=vec_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path
# ---------------------------------------------------------------------------

def ivf_assign(df: DataFrame, centroids: DataFrame,
               *, id_col: str = "vec_id",
               vec_col: str = "embedding",
               nprobe: int = 1) -> DataFrame:
    """Assign every vector to its `nprobe` nearest centroids (max cosine,
    centroid id as tie-break) — the IVF coarse quantizer, expressed
    relationally: broadcast the (small) centroid list, score, keep the
    top-n via grouped struct-max (n=1) or window (n>1; used for the query
    side, which is small — the corpus side always stores 1 list per
    vector).

    At 100 TB the corpus is *written* partitioned by `centroid_id`; a
    query then reads only its probe lists. Centroid selection is the
    caller's policy (k-means, or deterministic sampling via
    `quality.deterministic_sample` — anything that yields a small
    DataFrame); keeping it an input keeps this operator trainable-free
    and oracle-checkable.

    Argmax is a grouped struct-max, not a window: the window formulation
    shuffles |corpus|×|centroids| rows *with their embedding arrays*; the
    struct-max aggregates map-side so the exchange carries one tiny row
    per vector, and embeddings are joined back afterwards. Tie-break is
    the smallest centroid_id (negated inside the max), matching the
    window/row_number formulation the SQL oracle states."""
    # Norms precomputed per vector (once for 50k corpus rows + once per
    # centroid), so each of the |corpus|×|centroids| pairs evaluates ONE
    # dot product instead of three — same IEEE value as cosine() (the
    # norm is the identical expression, just not recomputed per pair).
    c = F.broadcast(centroids.select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("cent_vec"),
        l2_norm(vec_col).alias("cent_norm")))
    d = df.select(id_col, vec_col, l2_norm(vec_col).alias("__vnorm"))
    scored = d.crossJoin(c).select(
        F.col(id_col),
        F.col("centroid_id"),
        (dot(vec_col, "cent_vec")
         / (F.col("__vnorm") * F.col("cent_norm"))).alias("cent_sim"))
    if nprobe == 1:
        best = scored.groupBy(id_col).agg(
            F.max(F.struct(F.col("cent_sim"),
                           (-F.col("centroid_id")).alias("neg_cid"))).alias("b"))
        assign = best.select(
            id_col,
            (-F.col("b.neg_cid")).cast(dict(scored.dtypes)["centroid_id"])
             .alias("centroid_id"),
            F.col("b.cent_sim").alias("cent_sim"))
    else:
        from pyspark.sql.window import Window

        w = Window.partitionBy(id_col).orderBy(
            F.col("cent_sim").desc(), F.col("centroid_id"))
        assign = (scored.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") <= nprobe)
                  .select(id_col, "centroid_id", "cent_sim"))
    return df.select(id_col, vec_col).join(assign, id_col)


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 5, *, id_col: str = "vec_id",
             vec_col: str = "embedding", nprobe: int = 1) -> DataFrame:
    """IVF ANN top-k: the corpus is assigned to its nearest centroid
    (stored 1-probe lists); each query probes its `nprobe` nearest
    centroids' lists, reranked by exact cosine. Equi-join on centroid_id
    replaces the cross join — cost ∝ nprobe · list length
    (|corpus| / n_centroids on balanced lists). `nprobe` is the standard
    IVF recall/cost knob: recall is monotone in it, cost linear."""
    from pyspark.sql.window import Window

    # Norms are computed ONCE per vector here (one extra HOF pass over
    # each side), so the rerank evaluates a single dot product per
    # candidate pair instead of three aggregates — same IEEE bits as
    # cosine() because sqrt(dot(v,v)) is a deterministic function of v.
    ca = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col) \
        .select(F.col(id_col).alias("match_id"),
                F.col(vec_col).alias("c_vec"), "centroid_id",
                l2_norm(vec_col).alias("c_norm"))
    # A corpus vector lives in exactly one list and a query's nprobe
    # centroids are distinct, so each (query, match) candidate appears at
    # most once — no dedup needed after the probe join.
    qa = F.broadcast(
        ivf_assign(queries, centroids, id_col=id_col, vec_col=vec_col,
                   nprobe=nprobe)
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("q_vec"), "centroid_id",
                l2_norm(vec_col).alias("q_norm")))
    scored = (qa.join(ca, "centroid_id")
                .filter(F.col("query_id") != F.col("match_id"))
                .select("query_id", "match_id", "centroid_id",
                        (dot("q_vec", "c_vec")
                         / (F.col("q_norm") * F.col("c_norm")))
                        .alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("match_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= k))


def cosine_near_dup_pairs(df: DataFrame, threshold: float,
                          *, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          table: int = 0,
                          n_planes: int = PLANES_PER_TABLE) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family, E1×E2): two
    vectors are near-dups when cosine ≥ threshold. Candidates come from
    one LSH bucket table (high-cosine pairs land in the same sign bucket
    with high probability), so the comparison is bucket-local — never an
    all-pairs scan. Output: (id_a < id_b, cos_sim).

    `n_planes` is the bucket width — 2^n_planes buckets, expected
    occupancy N/2^n_planes. The caller MUST raise it with corpus size
    (n_planes ≈ log2(N / target_bucket_size)) or the bucket-local
    comparison goes quadratic; the fixed default is test-corpus sizing."""
    b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                  l2_norm(vec_col).alias("n"),
                  hyperplane_bucket(vec_col, table,
                                    planes_per_table=n_planes).alias("key"))
    a = b.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                 F.col("n").alias("na"), "key")
    c = b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                 F.col("n").alias("nb"), "key")
    pairs = (a.join(c, "key")
              .filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b",
                      (dot("va", "vb") / (F.col("na") * F.col("nb")))
                      .alias("cos_sim")))
    return pairs.filter(F.col("cos_sim") >= threshold)
