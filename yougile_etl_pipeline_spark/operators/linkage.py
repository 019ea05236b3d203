"""Record linkage: fuzzy matching of dirty string keys at scale.

The reference pipeline joins on clean surrogate keys only; real ETL
inherits vendor feeds where "Acme Corp." must meet "ACME Corp". The
scalable shape is the same as near-dup dedup (SURVEY.md §2.10 E1):
NEVER score all pairs — generate candidates with an equi-join on a
blocking key, then score only candidates with an exact distance.

Blocking here is shared-token: two strings are candidates iff they share
at least one normalized token. Like shingle blocking, a hot token ("inc",
"ltd") makes the self-join quadratic, so tokens above a document
-frequency cap are dropped from CANDIDATE GENERATION only (scoring still
sees full strings, so the cap costs recall only for pairs linked *solely*
by a stop-token — pairs that levenshtein would reject anyway at sane
thresholds). Everything is codegen: split/explode/join/levenshtein, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_self_join", "fuzzy_join"]


def _tokened(df: DataFrame, id_col: str, text_col: str,
             max_token_df: int | None) -> DataFrame:
    toks = (df.select(F.col(id_col).alias("__id"),
                      F.col(text_col).alias("__s"))
            .select("__id", "__s",
                    F.explode(F.array_distinct(F.split(
                        F.lower(F.trim(F.col("__s"))), " +"))).alias("__tok")))
    if max_token_df is not None:
        dfreq = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
        toks = toks.join(
            dfreq.filter(F.col("__df") <= max_token_df).select("__tok"),
            "__tok")
    return toks


def fuzzy_self_join(df: DataFrame, id_col: str, text_col: str,
                    *, max_dist: int = 3,
                    max_token_df: int | None = 1000) -> DataFrame:
    """Near-identical string pairs within one table:
    (id_a, id_b, dist) with ``levenshtein ≤ max_dist`` and ``id_a < id_b``.

    Candidates = distinct pairs sharing a kept token (one equi-join on the
    token — the df² blowup is bounded by the frequency cap exactly like
    `shingle_jaccard_pairs`); the levenshtein DP runs once per CANDIDATE,
    not per pair of rows. Distance is an exact integer → identical in any
    engine (oracle-paired)."""
    toks = _tokened(df, id_col, text_col, max_token_df)
    a = toks.select(F.col("__id").alias("id_a"), F.col("__s").alias("__sa"),
                    "__tok")
    b = toks.select(F.col("__id").alias("id_b"), F.col("__s").alias("__sb"),
                    "__tok")
    cand = (a.join(b, "__tok")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "__sa", "__sb")
             .distinct())
    return (cand.withColumn("dist", F.levenshtein("__sa", "__sb"))
                .filter(F.col("dist") <= max_dist)
                .select("id_a", "id_b", "dist"))


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_on: tuple[str, str], right_on: tuple[str, str],
               *, max_dist: int = 3,
               max_token_df: int | None = 1000) -> DataFrame:
    """Two-table fuzzy equi-join: (left_id, right_id, dist) for pairs
    within ``max_dist`` edits, candidate-blocked on shared tokens.
    ``left_on``/``right_on`` are (id_col, text_col) pairs."""
    lt = _tokened(left, *left_on, max_token_df)
    rt = _tokened(right, *right_on, max_token_df)
    cand = (lt.select(F.col("__id").alias("left_id"),
                      F.col("__s").alias("__sl"), "__tok")
            .join(rt.select(F.col("__id").alias("right_id"),
                            F.col("__s").alias("__sr"), "__tok"), "__tok")
            .select("left_id", "right_id", "__sl", "__sr")
            .distinct())
    return (cand.withColumn("dist", F.levenshtein("__sl", "__sr"))
                .filter(F.col("dist") <= max_dist)
                .select("left_id", "right_id", "dist"))
