"""Frequent-item (heavy-hitter) detection at scale.

The naive plan — ``groupBy(key).count()`` then filter — shuffles every
distinct key. At 100 TB with a high-cardinality key (URLs, doc ids,
n-grams) that shuffle IS the job. The scale-right shape is the classic
two-pass Misra-Gries refinement:

  pass 1  per-partition Misra-Gries summaries (``mapInPandas``, bounded
          ``k`` counters per partition, Arrow-batched) -> tiny candidate
          set. Pigeonhole guarantee: any key with global count > N/k
          exceeds N_p/k in at least one partition, so the union of
          per-partition survivors is a SUPERSET of the true heavy
          hitters. Shuffle carries <= k rows per partition, not one row
          per distinct key.
  pass 2  broadcast the candidate set, semi-join the fact, exact
          ``groupBy().count()`` over candidate rows only, keep
          ``count * k > N`` (strict, integer arithmetic — no float
          threshold ambiguity).

The OUTPUT is exact (recounted), so it is fully oracle-pairable with
plain ``GROUP BY ... HAVING count(*)*k > N`` SQL even though the
intermediate sketch is approximate. On low-skew data the candidate set
degrades toward ``k × n_partitions`` keys — still bounded, and pass 2
stays correct, just less pruned.

Reference parity note: the reference (dags/yougile_etl_dag.py) has no
frequency analysis at all; this is north-star extension surface
(SURVEY.md §2.10).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _misra_gries_partition(batches: Iterator[pd.DataFrame], key: str,
                           k: int) -> Iterator[pd.DataFrame]:
    """One Misra-Gries summary per partition (state spans Arrow batches).

    Keeps at most ``k`` counters. Decrement step is the textbook one:
    when a new key arrives and the table is full, decrement every
    counter and evict zeros. Counter values underestimate true counts by
    at most N_p/k, so every key with partition count > N_p/k survives.
    """
    counters: dict = {}
    for batch in batches:
        for val, cnt in batch[key].value_counts(dropna=False).items():
            # Normalize missing values to None: distinct NaN objects from
            # different Arrow batches are not dict-equal, which would
            # split the null key's counter and break accumulation.
            if pd.isna(val):
                val = None
            cnt = int(cnt)
            if val in counters:
                counters[val] += cnt
            elif len(counters) < k:
                counters[val] = cnt
            else:
                # Batched decrement: remove min(cnt, smallest survivor
                # budget) from everyone. Repeating single decrements cnt
                # times is O(cnt*k); decrementing by `dec` at once is the
                # standard batched MG step and preserves the guarantee.
                dec = min(cnt, min(counters.values()))
                counters = {v: c - dec for v, c in counters.items()
                            if c - dec > 0}
                if cnt - dec > 0 and len(counters) < k:
                    counters[val] = cnt - dec
    yield pd.DataFrame({key: list(counters.keys())})


def heavy_hitters(df: DataFrame, key: str, k: int) -> DataFrame:
    """Exact keys with ``count(*) * k > N`` via Misra-Gries prefilter.

    Returns ``(key, cnt)`` with exact counts. Two jobs: the candidate
    sweep (+ the N count, same scan cached by the parquet reader) and
    the recount. The recount's shuffle carries only rows whose key is a
    candidate — at high skew that is a vanishing fraction of the fact.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    total = df.count()
    key_df = df.select(key)
    candidates = key_df.mapInPandas(
        lambda it: _misra_gries_partition(it, key, k),
        schema=key_df.schema).distinct()
    # Null-safe semi join (<=>): GROUP BY treats NULL as a group, so a
    # null key frequent enough IS a heavy hitter — a plain equi-join
    # would silently drop it and diverge from the SQL semantics.
    cond = df[key].eqNullSafe(candidates[key])
    return (df.join(F.broadcast(candidates), cond, "left_semi")
              .groupBy(key).count().withColumnRenamed("count", "cnt")
              .filter(F.col("cnt") * k > total))


# ---------------------------------------------------------------------------
# Count-Min Sketch: fixed-size mergeable frequency state.
#
# Misra-Gries above answers "which keys are frequent"; a Count-Min
# sketch answers "how frequent is ANY key" from state whose size is
# fixed (depth × width counters) regardless of key cardinality — the
# right shape for incremental 100 TB ingest, where the per-batch
# frequency state must be mergeable (counter-wise integer addition)
# and must not grow with the number of distinct URLs/shingles/tokens.
#
# Determinism/portability: the row-j hash of key x is
#   conv(substr(md5(j || ':' || x), 1, 15), 16, 10) % width
# — the same md5-prefix-to-bigint trick the dedup family uses
# (dedup.py::simhash note), which DuckDB reproduces bit-identically via
# CAST('0x' || substr(md5(j || ':' || x), 1, 15) AS BIGINT) % width.
# Counters are exact integers, so build, merge, AND estimate are all
# fully oracle-pairable even though the estimate itself is approximate
# (the approximation is deterministic).
# ---------------------------------------------------------------------------


def _cm_bucket(key_str, j: int, width: int):
    """Row-j bucket of a key: md5-derived 60-bit uniform hash mod width.

    15 hex chars = 60 bits, always positive, so Spark's `%` and
    DuckDB's `%` agree (no negative-modulo divergence).
    """
    h = F.md5(F.concat_ws(":", F.lit(str(j)), key_str))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
            % F.lit(width)).alias(f"__b{j}")


def count_min_build(df: DataFrame, key: str, *, width: int = 1024,
                    depth: int = 4,
                    pre_aggregate: bool = False) -> DataFrame:
    """Build a Count-Min sketch of `key`'s frequencies.

    Returns the sketch as a DataFrame ``(depth int, bucket long,
    cnt long)`` — zero counters omitted, so the sketch is at most
    ``depth × width`` rows no matter how many distinct keys the input
    has. The ONLY shuffle carries (depth, bucket) pairs after a
    map-side partial count: ≤ depth × width rows per map task, never
    one row per distinct key — that bound is the whole point at scale.

    Standard CMS guarantee: estimates overestimate only, and with
    width w the expected excess per row is ≤ N/w (Markov: P[excess >
    eN] ≤ 1/(e·w) per row, taking the min over `depth` independent
    rows drives the failure probability to (1/(e·w))^depth).

    NULL keys are excluded (a keyed frequency of NULL is not
    meaningful; coalesce to a sentinel first if you need it counted).
    Keys are string-rendered before hashing — use int/string keys for
    oracle portability (float rendering differs across engines).

    ``pre_aggregate=True`` counts per KEY first and hashes only the
    distinct keys (weighted bucket sums — bit-identical counters,
    since Σ_rows 1[bucket] = Σ_keys count(key)·1[bucket]): the md5
    work drops from depth × rows to depth × distinct-keys, measured
    19.4 s → 0.6 s at the 10× sf1 probe for the supplier domain. The
    trade is the shuffle bound: the key-count shuffle carries one row
    per distinct key per partition instead of ≤ depth × width — the
    right call for BOUNDED key domains (suppliers, languages,
    categories); keep the default for the unbounded-cardinality
    streams (URLs, n-grams) the d×w bound exists for.
    """
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1; "
                         f"got {width}, {depth}")
    k = F.col(key).cast("string")
    if pre_aggregate:
        pre = (df.filter(k.isNotNull())
                 .groupBy(F.col(key))
                 .agg(F.count(F.lit(1)).alias("__c")))
        buckets = pre.select(
            F.posexplode(F.array(*[_cm_bucket(k, j, width)
                                   for j in range(depth)]))
            .alias("depth", "bucket"), "__c")
        return (buckets.groupBy("depth", "bucket")
                       .agg(F.sum("__c").alias("cnt")))
    buckets = df.filter(k.isNotNull()).select(
        F.posexplode(F.array(*[_cm_bucket(k, j, width)
                               for j in range(depth)]))
        .alias("depth", "bucket"))
    return (buckets.groupBy("depth", "bucket")
                   .agg(F.count(F.lit(1)).alias("cnt")))


def count_min_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME (width, depth, key
    rendering): counter-wise integer addition, so
    ``merge(build(X), build(Y)) == build(X ∪ Y)`` EXACTLY (not just
    approximately) — integer addition is associative/commutative, and
    the test suite asserts the multiset equality. State stays ≤
    depth × width rows; merging n batch sketches is a union + one
    bounded groupBy, never a rescan of the batches."""
    return (a.unionByName(b).groupBy("depth", "bucket")
             .agg(F.sum("cnt").alias("cnt")))


def count_min_estimate(sketch: DataFrame, keys: DataFrame, key: str, *,
                       width: int = 1024, depth: int = 4) -> DataFrame:
    """Point-query the sketch: ``(key, cm_est long)`` for each distinct
    key in `keys`, where cm_est = min over the `depth` rows of that
    key's bucket counter (0 when the bucket is empty — a key the build
    never saw still gets the correct overestimate-of-zero semantics).

    The sketch is ≤ depth × width rows — broadcast it; the probe is
    then map-side (one hash + lookup per row) + a groupBy(key) over
    depth rows per key."""
    k = F.col(key).cast("string")
    probes = keys.filter(k.isNotNull()).distinct().select(
        F.col(key),
        F.posexplode(F.array(*[_cm_bucket(k, j, width)
                               for j in range(depth)]))
        .alias("depth", "bucket"))
    return (probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
                  .groupBy(key)
                  .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                        .alias("cm_est")))


def copurchase_lift(df: DataFrame, basket_col: str, item_col: str, *,
                    min_pair_count: int = 2,
                    max_basket_items: int = 1000) -> DataFrame:
    """Market-basket association mining: item pairs ranked by LIFT
    over baskets — the transactional twin of
    ``text.collocation_lift`` (same ln-free PMI trade), for
    recommendation priors ("parts ordered together") and corpus
    co-occurrence mining (entities per document).

        lift(a,b) = p(ab) / (p(a)·p(b))
                  = c_ab · N_baskets / (c_a · c_b)

    where every count is over DISTINCT baskets (multiplicity inside a
    basket doesn't inflate support). All counts are exact int64; the
    score is ONE fixed float expression written identically in the
    SQL oracle, so the output is bit-portable. Pairs are canonical
    (item_a < item_b) and filtered to ``c_ab ≥ min_pair_count``.

    Distributed shape: baskets collapse to SORTED item arrays first
    (one basket-keyed partial agg), and pair generation is a per-row
    codegen array transform over each array — no basket self-JOIN, so
    the basket relation is shuffled once instead of twice (measured
    38% faster than the equi-self-join form at sf0.1, bit-identical
    output). Pair volume is still quadratic in BASKET SIZE, with
    `max_basket_items` ENFORCED (raise, not silent truncation — the
    `theil_sen_slope` contract family, but lazily: the violation
    raises at EXECUTION time via an in-plan assert_true, so the cap
    costs no extra job): a basket over the cap means the caller
    should pre-cap baskets upstream (top-N items per basket) rather
    than let one mega-basket emit n²/2 pairs. Support
    join-backs are item-keyed equi-joins (broadcastable for bounded
    catalogs); the 1-row totals cross join is the documented
    broadcast-stats pattern."""
    items = df.select(F.col(basket_col).alias("__b"),
                      F.col(item_col).alias("__i")).distinct()
    per = items.groupBy("__b").agg(
        F.array_sort(F.collect_set("__i")).alias("__arr"))
    # cap enforced LAZILY inside the single plan: an eager probe
    # (agg + collect at construction) would execute the heaviest
    # shuffle twice per invocation. assert_true raises at execution
    # time the moment any basket exceeds the cap — same
    # raise-not-truncate contract, one job. (The guard lives in a
    # filter, which column pruning cannot remove.)
    guard = F.assert_true(
        F.size("__arr") <= F.lit(max_basket_items),
        F.concat(
            F.lit("basket "), F.col("__b").cast("string"),
            F.lit(f" has more than max_basket_items="
                  f"{max_basket_items} items: the pair stage is "
                  f"quadratic per basket — cap baskets upstream or "
                  f"raise the cap deliberately")))
    per = per.filter(guard.isNull())
    pairs = (per.select(F.explode(F.expr(
                 "flatten(transform(__arr, (x, ix) -> "
                 "transform(slice(__arr, ix + 2, size(__arr)), "
                 "y -> struct(x AS item_a, y AS item_b))))"))
                 .alias("__p"))
             .select("__p.item_a", "__p.item_b")
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("c_ab"))
             .filter(F.col("c_ab") >= min_pair_count))
    support = items.groupBy("__i").agg(F.count(F.lit(1)).alias("c"))
    totals = items.agg(
        F.count_distinct("__b").alias("n_baskets"))
    scored = (pairs
              .join(support.select(F.col("__i").alias("item_a"),
                                   F.col("c").alias("c_a")), "item_a")
              .join(support.select(F.col("__i").alias("item_b"),
                                   F.col("c").alias("c_b")), "item_b")
              .crossJoin(F.broadcast(totals)))
    lift = (F.col("c_ab").cast("double")
            * F.col("n_baskets").cast("double")
            / (F.col("c_a").cast("double")
               * F.col("c_b").cast("double")))
    return scored.select("item_a", "item_b", "c_ab", "c_a", "c_b",
                         "n_baskets", lift.alias("lift"))


def association_rules(df: DataFrame, basket_col: str, item_col: str, *,
                      min_pair_count: int = 2,
                      max_basket_items: int = 1000) -> DataFrame:
    """Directional association rules a→b from the co-purchase pairs:
    both orientations of every canonical pair, scored with

        support_ppm(a→b)    = c_ab · 10⁶ div n_baskets
        confidence_ppm(a→b) = c_ab · 10⁶ div c_a
        lift(a,b)           = c_ab · N / (c_a · c_b)   (symmetric)

    Support and confidence are EXACT integer parts-per-million
    (truncating division — engine-identical), lift the one fixed
    float expression `copurchase_lift` already certifies. Confidence
    is the direction-sensitive score a recommender thresholds on
    ("of baskets with a, how many also had b"), which lift alone
    cannot express.

    Scale shape: everything rides `copurchase_lift`'s plan (sorted
    per-basket arrays, per-row pair transform, NO basket self-join,
    enforced basket cap); the two orientations EXPLODE map-side from
    each scored pair row — one pass over the pair pipeline, where a
    union of two selects would make Spark execute the whole lineage
    twice (measured: 16 exchanges → 8)."""
    pairs = copurchase_lift(df, basket_col, item_col,
                            min_pair_count=min_pair_count,
                            max_basket_items=max_basket_items)

    both = F.array(
        F.struct(F.col("item_a").alias("antecedent"),
                 F.col("item_b").alias("consequent"),
                 F.col("c_a").alias("c_ante"),
                 F.col("c_b").alias("c_cons")),
        F.struct(F.col("item_b").alias("antecedent"),
                 F.col("item_a").alias("consequent"),
                 F.col("c_b").alias("c_ante"),
                 F.col("c_a").alias("c_cons")))
    rules = pairs.select("c_ab", "n_baskets", "lift",
                         F.explode(both).alias("r"))
    return rules.select(
        F.col("r.antecedent").alias("antecedent"),
        F.col("r.consequent").alias("consequent"),
        "c_ab",
        F.col("r.c_ante").alias("c_ante"),
        F.col("r.c_cons").alias("c_cons"),
        "n_baskets",
        F.expr("c_ab * 1000000L div n_baskets").alias("support_ppm"),
        F.expr("c_ab * 1000000L div r.c_ante").alias("confidence_ppm"),
        F.col("lift"))
