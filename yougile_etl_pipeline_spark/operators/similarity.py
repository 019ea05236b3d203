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

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "brute_force_topk",
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
# to 1-(1-p)^L. 4×4 is sized for the test corpus (16 buckets/table,
# ~30 vecs each); at scale raise P with corpus size (smaller buckets) and
# L to recover recall.
N_TABLES = 4
PLANES_PER_TABLE = 4

# Fixed random hyperplanes (seeded — identical in Spark and the SQL oracle;
# regenerating with the same seed is part of the public contract).
_rng = np.random.RandomState(20260101)
HYPERPLANES: list[list[list[float]]] = [
    [[round(float(x), 6) for x in _rng.randn(EMBED_DIM)]
     for _ in range(PLANES_PER_TABLE)]
    for _ in range(N_TABLES)
]


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


def hyperplane_bucket(vec_col: Column | str, table: int) -> Column:
    """Sign-bit bucket key for one LSH table: one char per hyperplane
    ('1' if dot>0 else '0'), concatenated. String key → join-friendly,
    storable, identical in the SQL oracle."""
    bits = [
        F.when(dot(vec_col, F.array(*[F.lit(v) for v in plane])) > 0,
               F.lit("1")).otherwise(F.lit("0"))
        for plane in HYPERPLANES[table]
    ]
    return F.concat(*bits)


def hyperplane_bucket_sql(vec_expr: str, table: int) -> str:
    """The DuckDB-SQL twin of `hyperplane_bucket` for the oracle."""
    bits = []
    for plane in HYPERPLANES[table]:
        lit = "[" + ", ".join(f"{v!r}" for v in plane) + "]::DOUBLE[]"
        bits.append(
            f"(CASE WHEN list_dot_product({vec_expr}::DOUBLE[], {lit}) > 0 "
            f"THEN '1' ELSE '0' END)"
        )
    return " || ".join(bits)


def _bucketed(df: DataFrame, id_alias: str, vec_alias: str,
              id_col: str, vec_col: str) -> DataFrame:
    """(id, vec) → one row per LSH table with its bucket key."""
    tables = F.array(*[
        F.struct(F.lit(t).alias("tbl"),
                 hyperplane_bucket(vec_col, t).alias("key"))
        for t in range(N_TABLES)
    ])
    return df.select(F.col(id_col).alias(id_alias),
                     F.col(vec_col).alias(vec_alias),
                     F.explode(tables).alias("b")) \
             .select(id_alias, vec_alias,
                     F.col("b.tbl").alias("tbl"), F.col("b.key").alias("key"))


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    *, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: candidates = bucket collision in ANY of the L hash
    tables, deduplicated, reranked by exact cosine. Recall < 1 by design;
    the scale win is that candidate generation is an equi-join on
    (table, key) instead of a cross join — at 100 TB the corpus is
    written bucketed/partitioned by the key and each query probes L
    buckets."""
    from pyspark.sql.window import Window

    cb = _bucketed(corpus, "match_id", "c_vec", id_col, vec_col) \
        .withColumn("c_norm", l2_norm("c_vec"))
    qb = F.broadcast(
        _bucketed(queries, "query_id", "q_vec", id_col, vec_col)
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
# IVF (inverted-file) ANN — the second scale path
# ---------------------------------------------------------------------------

def ivf_assign(df: DataFrame, centroids: DataFrame,
               *, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, centroid
    id as tie-break) — the IVF coarse quantizer, expressed relationally:
    broadcast the (small) centroid list, score, keep argmax via window.

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
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("cent_sim"),
                       (-F.col("centroid_id")).alias("neg_cid"))).alias("b"))
    assign = best.select(
        id_col,
        (-F.col("b.neg_cid")).cast(dict(scored.dtypes)["centroid_id"])
         .alias("centroid_id"),
        F.col("b.cent_sim").alias("cent_sim"))
    return df.select(id_col, vec_col).join(assign, id_col)


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 5, *, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF ANN top-k: both sides are assigned to centroids; candidates =
    corpus vectors in the query's centroid list (1-probe), reranked by
    exact cosine. Equi-join on centroid_id replaces the cross join —
    cost ∝ list length (|corpus| / n_centroids on balanced lists)."""
    from pyspark.sql.window import Window

    # Norms are computed ONCE per vector here (one extra HOF pass over
    # each side), so the rerank evaluates a single dot product per
    # candidate pair instead of three aggregates — same IEEE bits as
    # cosine() because sqrt(dot(v,v)) is a deterministic function of v.
    ca = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col) \
        .select(F.col(id_col).alias("match_id"),
                F.col(vec_col).alias("c_vec"), "centroid_id",
                l2_norm(vec_col).alias("c_norm"))
    qa = F.broadcast(
        ivf_assign(queries, centroids, id_col=id_col, vec_col=vec_col)
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
                          table: int = 0) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family, E1×E2): two
    vectors are near-dups when cosine ≥ threshold. Candidates come from
    one LSH bucket table (high-cosine pairs land in the same sign bucket
    with high probability), so the comparison is bucket-local — never an
    all-pairs scan. Output: (id_a < id_b, cos_sim)."""
    b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                  l2_norm(vec_col).alias("n"),
                  hyperplane_bucket(vec_col, table).alias("key"))
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
