"""Distributed BPE vocabulary induction — the tokenizer-training side
of a training-data pipeline, as relational operators.

Byte-pair encoding (Sennrich et al. 2016, the public recipe every
GPT-style tokenizer descends from) alternates two steps over a word
-frequency table: (1) count adjacent symbol pairs corpus-wide, (2)
merge the most frequent pair greedily left-to-right inside every word.
Both steps are relational:

  pair counts  explode adjacent positions (map-only) → one groupBy
               (left, right) with map-side partial sums of the exact
               integer word weights — the shuffle carries one row per
               DISTINCT pair, bounded by vocab², not corpus size.
  merge        the winning pair is ONE broadcast row; the rewrite is a
               per-word codegen `aggregate` fold — zero shuffle.

The only driver-side value is the single winning pair per iteration —
that IS the merge table BPE exists to produce (a driver artifact by
nature, like the k-means centroid list `similarity.py` collects, and
bounded at one row per merge).

Determinism: weights are exact ints; the winner ties break
lexicographically on (left, right); the greedy fold is sequential per
word with a fixed rule — so every step is bit-identical across
engines and partitionings, and the DuckDB oracle (greedy selection via
the run-parity window formulation) is proven equal in
tests/test_bpe.py. Staged for round-6 registry certification.

Precondition: symbols must be non-empty strings (a merged token
``left || right`` must differ from ``left``, which the greedy fold's
no-flag overlap rule relies on; empty-string symbols would break it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pair_counts", "best_pair", "apply_merge", "bpe_train",
           "char_symbols", "bpe_encode"]


def char_symbols(word_col, *, end_marker: str = "</w>"):
    """word → array of single-char symbols + an end-of-word marker
    (the classic BPE alphabet; the marker keeps word-final merges
    distinct from word-internal ones)."""
    w = F.col(word_col) if isinstance(word_col, str) else word_col
    # empty-word guard: sequence(1, 0) is the DESCENDING [1, 0] trap
    # (see text._ngram_starts) — an empty word must yield [marker], not
    # crash or emit an empty-string symbol (which would violate the
    # non-empty-symbols precondition above).
    chars = F.when(F.length(w) > 0,
                   F.transform(F.sequence(F.lit(1), F.length(w)),
                               lambda i: F.substring(w, i, F.lit(1)))) \
             .otherwise(F.array().cast("array<string>"))
    return F.concat(chars, F.array(F.lit(end_marker)))


def pair_counts(df: DataFrame, *, syms_col: str = "syms",
                weight_col: str | None = None) -> DataFrame:
    """Corpus-wide adjacent-pair frequencies: ``(left, right, cnt)``.

    `weight_col` (the word's corpus frequency) multiplies each
    occurrence; None weights every word 1. Pairs inside one word count
    with multiplicity ("a a a" contributes (a,a) twice), matching the
    reference BPE recipe."""
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    s = F.col(syms_col)
    starts = F.when(F.size(s) > 1,
                    F.sequence(F.lit(1), F.size(s) - 1)) \
              .otherwise(F.array().cast("array<int>"))
    ex = df.select(w.alias("__w"), s.alias("__s"),
                   F.explode(starts).alias("__i"))
    return (ex.select(F.element_at("__s", F.col("__i")).alias("left"),
                      F.element_at("__s", F.col("__i") + 1).alias("right"),
                      "__w")
              .groupBy("left", "right")
              .agg(F.sum("__w").alias("cnt")))


def best_pair(counts: DataFrame) -> tuple[str, str, int] | None:
    """The merge winner: max cnt, ties broken lexicographically on
    (left, right) — a deterministic single row (None on an empty pair
    table, i.e. every word is fully merged). max-cnt-then-min-strings
    needs opposite orderings, which one struct extremum can't express
    for strings — so two tiny aggregations: the max count (one scalar),
    then the lexicographic min (left, right) among its holders. Both
    partial-aggregate map-side; the one-row collect is the merge-table
    emission discussed in the module docstring."""
    mx = counts.agg(F.max("cnt").alias("m")).collect()
    if not mx or mx[0]["m"] is None:
        return None
    m = mx[0]["m"]
    r = (counts.filter(F.col("cnt") == m)
               .agg(F.min(F.struct("left", "right")).alias("p"))
               .collect()[0]["p"])
    return (r["left"], r["right"], m)


def apply_merge(df: DataFrame, left: str, right: str, *,
                syms_col: str = "syms") -> DataFrame:
    """Rewrite every word, merging (left, right) greedily left-to-right
    without overlap — "a a a" with pair (a, a) becomes ["aa", "a"],
    never ["aa", "aa"].

    One codegen `aggregate` fold per word, map-only (no shuffle, no
    Python): append each symbol to the accumulator unless the
    accumulator's tail equals `left` and the symbol equals `right`, in
    which case replace the tail with the merged token. Overlap safety
    needs no flag: a just-merged tail is ``left || right`` ≠ ``left``
    (non-empty symbols), so it can never be consumed again this pass."""
    merged = F.lit(left + right)
    fold = F.aggregate(
        F.col(syms_col),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))))
    return df.withColumn(syms_col, fold)


def bpe_train(df: DataFrame, n_merges: int, *, syms_col: str = "syms",
              weight_col: str | None = None,
              checkpoint_every: int = 8) -> tuple[DataFrame, list[tuple]]:
    """Run `n_merges` BPE iterations; returns (final symbol table,
    ordered merge list [(left, right, cnt), ...]) — the merge list is
    the tokenizer artifact. Lineage grows by one fold per iteration;
    `localCheckpoint` every `checkpoint_every` rounds truncates it
    (the `dedup_clusters`/PageRank deep-iteration pattern)."""
    merges: list[tuple] = []
    for it in range(n_merges):
        win = best_pair(pair_counts(df, syms_col=syms_col,
                                    weight_col=weight_col))
        if win is None:
            break
        merges.append(win)
        df = apply_merge(df, win[0], win[1], syms_col=syms_col)
        if (it + 1) % checkpoint_every == 0:
            df = df.localCheckpoint(eager=True)
    return df, merges


def bpe_encode(df: DataFrame, merges: list[tuple], *,
               word_col: str = "word",
               out_col: str = "tokens") -> DataFrame:
    """Apply a TRAINED merge table (the `bpe_train` artifact) to new
    text — the encode half of the tokenizer: every word starts as
    char symbols + end marker and each merge rewrites it via the same
    greedy left-to-right `apply_merge` fold the trainer used, so
    encoding is exactly reproducible from the artifact.

    The merge list is a driver-side constant (tokenizer vocabularies
    are bounded — 32k–100k merges — and ship with the model, the
    kmeans-centroid-collect economics); each merge compiles to ONE
    map-only codegen fold, no shuffle anywhere, so encoding
    parallelizes embarrassingly at any corpus size. Cost is
    O(merges · word_len) per word — the classic slow-path trade of
    reference BPE encoders; production encoders memoize per distinct
    word, which composes here by encoding `df.distinct()` on the word
    column and joining back (the caller's choice of grain).

    Returns the input plus ``out_col`` (array<string> subword tokens)
    and ``n_tokens``."""
    out = df.withColumn(out_col, char_symbols(word_col))
    for i, m in enumerate(merges):
        left, right = m[0], m[1]
        out = apply_merge(out, left, right, syms_col=out_col)
        # deep merge tables nest one fold per merge in the expression
        # tree; truncate lineage periodically like bpe_train does
        # (codegen/analysis limits, not correctness)
        if (i + 1) % 16 == 0 and i + 1 < len(merges):
            out = out.localCheckpoint(eager=False)
    return out.withColumn("n_tokens", F.size(F.col(out_col)))
