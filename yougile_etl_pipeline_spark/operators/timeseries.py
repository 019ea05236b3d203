"""Sequential-recurrence time-series operators in exact integer
arithmetic — currently exponential smoothing (EWMA).

EWMA is the canonical "can't oracle-pair" operator: s_t = α·x_t +
(1−α)·s_{t−1} in floats depends on evaluation order and rounding at
every step, so no cross-engine hash can match. The fixed-point
formulation makes it exact: with a RATIONAL α = p/q and inputs scaled
to exact integers, the recurrence

    s_1 = x_1·S
    s_t = (p·x_t·S + (q−p)·s_{t−1}) div q

is pure int64 arithmetic — bit-deterministic at any partitioning and
in any engine (same trick as `graph.pagerank_fixed_point` and the
DECIMAL k-means). The div-q floor each step loses < 1/S of a unit;
with S = 10⁶ that is noise at smoothing precision, and it is the SAME
noise everywhere.

Distributed shape: a per-key recurrence is inherently serial *within*
the key, so the operator shuffles once on the key, sorts each key's
events into an array (total order: (ts, event_id)), and runs the fold
as ONE codegen `aggregate` expression per key — no Python, no
iteration over rows, parallelism = |keys|. State is O(events-per-key)
in the array; for unbounded single-key streams use the stateful
streaming path (`streaming/stateful.py`) instead — this operator
targets bounded per-entity histories (sessions, users, devices),
where keys are plentiful and rows-per-key bounded.

Staged for round-6 registry certification; the DuckDB oracle (a
recursive CTE walking rn → rn+1 per key with the same integer
recurrence) is proven in tests/test_timeseries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["ewma_fixed_point", "holt_linear_fixed_point",
           "theil_sen_slope", "cusum_fixed_point", "mann_kendall_trend",
           "rolling_slope", "seasonal_baseline"]


def ewma_fixed_point(df: DataFrame, key_col: str, order_cols: list[str],
                     value_col: str, *,
                     alpha_num: int = 1, alpha_den: int = 4,
                     value_scale: int = 100,
                     sub_scale: int = 10**6) -> DataFrame:
    """Per-key EWMA of `value_col` over the `order_cols` total order.

    `value_col` must be exact at `value_scale` (e.g. 2-decimal money
    at scale 100): it is converted to integer units via DECIMAL — a
    value that isn't exact at that scale rounds half-up, once,
    identically everywhere. α = alpha_num/alpha_den must satisfy
    0 < num < den (ints).

    Returns one row per input row: key, order cols, and ``ewma`` — the
    smoothed value as a double (one final IEEE division of the exact
    int64 state; identical bits in any engine). Overflow bound:
    |x|·value_scale·sub_scale·alpha_den must fit int64 — values up to
    ~2·10⁹ units at the defaults.
    """
    if not (0 < alpha_num < alpha_den):
        raise ValueError("alpha must satisfy 0 < num < den")
    p, q = alpha_num, alpha_den
    v_int = (F.col(value_col)
             .cast(f"decimal(20,{len(str(value_scale)) - 1})")
             * value_scale).cast("bigint")
    ordered = F.array_sort(F.collect_list(F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        v_int.alias("__v"))))
    # fold: acc = struct(states: array<bigint>, last: bigint). The
    # first element seeds with x_1·S; each later element applies the
    # integer recurrence. `div` truncates; all terms are non-negative
    # for non-negative inputs, and floor==trunc there (for negative
    # values both engines truncate toward zero identically).
    S = sub_scale
    step = (
        f"(acc, x) -> named_struct("
        f"'states', concat(acc.states, array("
        f"  CASE WHEN size(acc.states) = 0 THEN x.__v * {S}L"
        f"       ELSE ({p}L * x.__v * {S}L"
        f"             + {q - p}L * acc.last) div {q}L END)), "
        f"'last', CASE WHEN size(acc.states) = 0 THEN x.__v * {S}L"
        f"             ELSE ({p}L * x.__v * {S}L"
        f"                   + {q - p}L * acc.last) div {q}L END)")
    grouped = df.groupBy(key_col).agg(ordered.alias("__seq"))
    folded = grouped.select(
        key_col, "__seq",
        F.expr(f"aggregate(__seq, "
               f"named_struct('states', CAST(array() AS ARRAY<BIGINT>), "
               f"'last', CAST(0 AS BIGINT)), {step}).states")
        .alias("__states"))
    pairs = folded.select(
        key_col,
        F.explode(F.arrays_zip("__seq", "__states")).alias("z"))
    return pairs.select(
        key_col,
        *[F.col(f"z.__seq.__o{i}").alias(c)
          for i, c in enumerate(order_cols)],
        (F.col("z.__states").cast("double")
         / F.lit(float(value_scale * S))).alias("ewma"))


def theil_sen_slope(df: DataFrame, key_col: str, time_col: str,
                    value_col: str, *,
                    max_rows_per_key: int = 1000) -> DataFrame:
    """Per-key Theil–Sen trend: the MEDIAN of all pairwise slopes
    (v_j − v_i)/(t_j − t_i), t_i < t_j — the robust regression slope
    (up to ~29% wild outliers cannot move it, unlike least squares;
    the classic published estimator for noisy per-entity telemetry).

    Exactness: each slope is ONE IEEE division of exact microsecond/
    value differences, identical on both engines; the median is the
    `exact_group_median` selection (middle VALUES under a total value
    order — tie-order-free), so the result is bit-portable. Duplicate
    timestamps within a key produce no pair (slope undefined); keys
    with < 2 distinct-time rows yield no row.

    Scale: pair generation is an equi-join on the key with an
    inequality residual — O(n²) per key BY DESIGN (that is the
    estimator; the published scalable variants subsample pairs).
    `max_rows_per_key` enforces the bound: keys larger than the cap
    raise rather than silently launching a quadratic stage — pre-
    aggregate to a coarser grain (daily means) or subsample upstream,
    and the docstring cap is an enforced contract like the ANN
    query-collect cap."""
    from yougile_etl_pipeline_spark.operators.quality import (
        exact_group_median,
    )

    sizes = (df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
               .agg(F.max("__n").alias("m")).collect())
    biggest = sizes[0]["m"] or 0
    if biggest > max_rows_per_key:
        raise ValueError(
            f"largest key has {biggest} rows > max_rows_per_key="
            f"{max_rows_per_key}: pairwise slopes are quadratic per "
            f"key — pre-aggregate or subsample, or raise the cap "
            f"deliberately")
    # cast first: a TIMESTAMP_NTZ column (raw parquet reads) is
    # rejected by unix_micros; the cast interprets NTZ in the session
    # TZ (UTC-pinned engine-wide), so the microseconds are stable.
    t = F.unix_micros(F.col(time_col).cast("timestamp")).alias("__t")
    base = df.select(F.col(key_col).alias("__k"), t,
                     F.col(value_col).cast("double").alias("__v")) \
             .filter(F.col("__v").isNotNull())
    a = base.select(F.col("__k"), F.col("__t").alias("__t1"),
                    F.col("__v").alias("__v1"))
    b = base.select(F.col("__k").alias("__k2"),
                    F.col("__t").alias("__t2"),
                    F.col("__v").alias("__v2"))
    pairs = (a.join(b, (F.col("__k") == F.col("__k2"))
                    & (F.col("__t1") < F.col("__t2")))
              .select(F.col("__k").alias(key_col),
                      ((F.col("__v2") - F.col("__v1"))
                       / (F.col("__t2") - F.col("__t1")).cast("double"))
                      .alias("__slope")))
    med = exact_group_median(pairs, key_col, "__slope", "sen_slope")
    n = pairs.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_pairs"))
    return n.join(med, key_col)


def cusum_fixed_point(df: DataFrame, key_col: str, order_cols: list[str],
                      value_col: str, *,
                      drift: float, threshold: float,
                      value_scale: int = 100) -> DataFrame:
    """Per-key one-sided CUSUM change-point detection in exact integer
    arithmetic — the standard sequential drift alarm (Page's test) for
    per-entity telemetry: the statistic accumulates how far values run
    ABOVE the allowance `drift` and alarms when it crosses
    `threshold`, then resets.

    Recurrence (all int64, in `value_scale` units):

        raw_t  = max(0, carry_{t-1} + x_t − k)
        alarm  = raw_t > h
        carry  = 0 if alarm else raw_t

    `drift`/`threshold` are given in VALUE units and quantized once,
    in Python, to k = round(drift·S), h = round(threshold·S) — after
    that every step is integer max/add/compare, so the output is
    bit-deterministic at any partitioning and engine (same fixed-point
    family as `ewma_fixed_point`; the reset-on-alarm keeps the state
    bounded by h + max|x|·S, far inside int64).

    Distributed shape: identical to `ewma_fixed_point` — one shuffle
    on the key, per-key total order (order_cols) collected into an
    array, the recurrence folded as ONE codegen `aggregate`
    expression; parallelism = |keys|, intended for bounded per-entity
    histories. Returns one row per input row: key, order cols,
    ``cusum`` (the raw statistic back in value units, one IEEE
    division) and ``is_alarm``."""
    if value_scale <= 0:
        raise ValueError("value_scale must be positive")
    k = int(round(drift * value_scale))
    h = int(round(threshold * value_scale))
    if h <= 0:
        raise ValueError("threshold must quantize to a positive level")
    v_int = (F.col(value_col)
             .cast(f"decimal(20,{len(str(value_scale)) - 1})")
             * value_scale).cast("bigint")
    ordered = F.array_sort(F.collect_list(F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        v_int.alias("__v"))))
    step = (
        f"(acc, x) -> named_struct("
        f"'states', concat(acc.states, array("
        f"  greatest(0L, acc.carry + x.__v - {k}L))), "
        f"'carry', CASE WHEN greatest(0L, acc.carry + x.__v - {k}L)"
        f"               > {h}L THEN 0L"
        f"          ELSE greatest(0L, acc.carry + x.__v - {k}L) END)")
    grouped = df.groupBy(key_col).agg(ordered.alias("__seq"))
    folded = grouped.select(
        key_col, "__seq",
        F.expr(f"aggregate(__seq, "
               f"named_struct('states', CAST(array() AS ARRAY<BIGINT>), "
               f"'carry', CAST(0 AS BIGINT)), {step}).states")
        .alias("__states"))
    pairs = folded.select(
        key_col,
        F.explode(F.arrays_zip("__seq", "__states")).alias("z"))
    return pairs.select(
        key_col,
        *[F.col(f"z.__seq.__o{i}").alias(c)
          for i, c in enumerate(order_cols)],
        (F.col("z.__states").cast("double")
         / F.lit(float(value_scale))).alias("cusum"),
        (F.col("z.__states") > F.lit(h)).alias("is_alarm"))


def rolling_slope(df: DataFrame, key_col: str, order_cols: list[str],
                  value_col: str, *, window_n: int = 20,
                  value_scale: int = 100) -> DataFrame:
    """Per-key trailing-window least-squares trend: the OLS slope of
    the last `window_n` values against their sequence index — the
    cheap local-trend detector next to `theil_sen_slope`'s robust
    global one.

    Exactness: x is the per-key row_number (small exact ints), y the
    `value_scale`-scaled integer value (same DECIMAL quantization as
    `ewma_fixed_point`), and the four window sums Σx, Σy, Σxy, Σx²
    are int64 — commutative exact addition, so partition-order-free.
    The slope is ONE IEEE division of two exact int64 terms

        slope = (n·Σxy − Σx·Σy) / ((n·Σx² − (Σx)²) · S)

    (value units per step), identical bits in every engine; NULL for
    single-row windows (zero denominator). Overflow bound: with R
    rows per key and |y| ≤ Y units, n·Σx² ≈ n²·R² and n·Σxy ≈ n·R·Y·n
    must fit 2⁵³ (exact double conversion) — at n=20, a 10⁸-row key
    with 10⁶-unit values still fits; for bigger keys re-base x per
    window upstream.

    Scale: ONE shuffle on the key; both window functions share the
    (key, order) sort. Returns every input row + ``n_window`` +
    ``slope``."""
    if window_n < 2:
        raise ValueError("window_n must be ≥ 2")
    v_int = (F.col(value_col)
             .cast(f"decimal(20,{len(str(value_scale)) - 1})")
             * value_scale).cast("bigint")
    order = [F.col(c) for c in order_cols]
    w_rank = Window.partitionBy(key_col).orderBy(*order)
    base = df.select(
        key_col, *order_cols,
        v_int.alias("__y"),
        F.row_number().over(w_rank).cast("bigint").alias("__x"))
    w = (Window.partitionBy(key_col).orderBy("__x")
         .rowsBetween(-(window_n - 1), Window.currentRow))
    # every window term must see the SAME point set: rows whose value
    # quantizes to NULL are excluded from n, Σx, and Σx² explicitly
    # (Σy and Σxy skip them via NULL propagation already) — otherwise
    # a NULL in the window mixes an n-row count with (n−1)-row sums
    # and the slope matches no regression at all
    x_nn = F.when(F.col("__y").isNotNull(), F.col("__x"))
    stats = base.select(
        key_col, *order_cols,
        F.count("__y").over(w).alias("n_window"),
        F.sum(x_nn).over(w).alias("__sx"),
        F.sum("__y").over(w).alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).over(w).alias("__sxy"),
        F.sum(x_nn * x_nn).over(w).alias("__sxx"))
    num = (F.col("n_window") * F.col("__sxy")
           - F.col("__sx") * F.col("__sy"))
    den = (F.col("n_window") * F.col("__sxx")
           - F.col("__sx") * F.col("__sx"))
    return stats.select(
        key_col, *order_cols, "n_window",
        F.when(den != 0,
               num.cast("double")
               / (den * F.lit(value_scale)).cast("double"))
        .alias("slope"))


def seasonal_baseline(df: DataFrame, ts_col: str, value_col: str, *,
                      group_cols: list[str] | None = None,
                      out_prefix: str = "baseline") -> DataFrame:
    """Hour-of-week seasonal profile + per-row residual — the
    first-line anomaly lens for periodic operational telemetry (a
    Tuesday-3am dip is only anomalous vs Tuesday-3am history, not vs
    the weekly mean).

    The baseline is the mean of `value_col` over every historical row
    sharing the same (group, day-of-week, hour) slot; exactness comes
    from the DECIMAL-sum/count form — the sum is exact at any
    partition order, and mean + residual are two fixed IEEE ops, so
    the output is bit-portable. Slots with a single row get residual
    0 by construction (their mean is themselves).

    Scale: the profile is a bounded aggregate — |groups|·7·24 rows —
    so the join-back BROADCASTS for any realistic group count; the
    fact is scanned twice (profile + join), or persist the profile to
    amortize across days. Day-of-week/hour come from the session-TZ
    timestamp (engine-wide UTC pin), matching the SQL oracle's
    dayofweek/hour. Returns every input row plus ``{prefix}_mean``
    and ``{prefix}_residual``."""
    groups = group_cols or []
    dow = F.dayofweek(F.col(ts_col).cast("timestamp"))
    hod = F.hour(F.col(ts_col).cast("timestamp"))
    keyed = df.withColumn("__dow", dow).withColumn("__hod", hod)
    prof = (keyed.filter(F.col(value_col).isNotNull())
            .groupBy(*groups, "__dow", "__hod")
            .agg((F.sum(F.col(value_col).cast("decimal(24,6)"))
                  .cast("double")
                  / F.count(F.lit(1)).cast("double"))
                 .alias(f"{out_prefix}_mean")))
    out = keyed.join(F.broadcast(prof), [*groups, "__dow", "__hod"],
                     "left")
    return (out.withColumn(
                f"{out_prefix}_residual",
                F.col(value_col) - F.col(f"{out_prefix}_mean"))
               .drop("__dow", "__hod"))


def holt_linear_fixed_point(
        df: DataFrame, key_col: str, order_cols: list[str],
        value_col: str, *,
        alpha_num: int = 1, alpha_den: int = 4,
        beta_num: int = 1, beta_den: int = 5,
        value_scale: int = 100,
        sub_scale: int = 10**6) -> DataFrame:
    """Per-key Holt double-exponential smoothing (level + linear
    trend) over the `order_cols` total order, in exact integer
    fixed-point — the trended sibling of `ewma_fixed_point`:

        l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}
        l_1 = x_1,  b_1 = 0

    Every step is integer multiply / truncating-divide / sum on int64
    state in units of 1/(value_scale·sub_scale), so a fixed recurrence
    depth is bit-deterministic across engines AND partitionings; the
    SQL twin is a recursive CTE (the `events_ewma` pattern). Trends go
    NEGATIVE on declining series — both engines truncate integer
    division toward zero, so the parity holds for signed state too.

    Scale shape: the per-key sequence collects to one array (bounded
    by the per-key event count, same contract as ewma_fixed_point) and
    folds once — one key shuffle, no iteration over the data.
    Returns key, order cols, `level`, `trend` (doubles: one final IEEE
    division of the exact int64 state each)."""
    if not (0 < alpha_num < alpha_den):
        raise ValueError("alpha must satisfy 0 < num < den")
    if not (0 < beta_num < beta_den):
        raise ValueError("beta must satisfy 0 < num < den")
    p, q = alpha_num, alpha_den
    r, s = beta_num, beta_den
    S = sub_scale
    v_int = (F.col(value_col)
             .cast(f"decimal(20,{len(str(value_scale)) - 1})")
             * value_scale).cast("bigint")
    ordered = F.array_sort(F.collect_list(F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        v_int.alias("__v"))))
    # The fold cannot let-bind l_t, so the l-recurrence expression is
    # textually repeated inside the b-recurrence — exactly like the
    # recursive-CTE oracle, which keeps the two evaluation orders
    # trivially identical.
    l_new = (f"({p}L * x.__v * {S}L"
             f" + {q - p}L * (acc.l + acc.b)) div {q}L")
    step = (
        f"(acc, x) -> CASE WHEN size(acc.ls) = 0 THEN named_struct("
        f"'ls', array(x.__v * {S}L), "
        f"'bs', array(CAST(0 AS BIGINT)), "
        f"'l', x.__v * {S}L, 'b', CAST(0 AS BIGINT)) "
        f"ELSE named_struct("
        f"'ls', concat(acc.ls, array({l_new})), "
        f"'bs', concat(acc.bs, array(({r}L * (({l_new}) - acc.l)"
        f"  + {s - r}L * acc.b) div {s}L)), "
        f"'l', {l_new}, "
        f"'b', ({r}L * (({l_new}) - acc.l)"
        f"  + {s - r}L * acc.b) div {s}L) END")
    grouped = df.groupBy(key_col).agg(ordered.alias("__seq"))
    folded = grouped.select(
        key_col, "__seq",
        F.expr(f"aggregate(__seq, "
               f"named_struct("
               f"'ls', CAST(array() AS ARRAY<BIGINT>), "
               f"'bs', CAST(array() AS ARRAY<BIGINT>), "
               f"'l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT)), "
               f"{step})").alias("__st")) \
        .select(key_col, "__seq",
                F.col("__st.ls").alias("__ls"),
                F.col("__st.bs").alias("__bs"))
    pairs = folded.select(
        key_col,
        F.explode(F.arrays_zip("__seq", "__ls", "__bs")).alias("z"))
    denom = float(value_scale * S)
    return pairs.select(
        key_col,
        *[F.col(f"z.__seq.__o{i}").alias(c)
          for i, c in enumerate(order_cols)],
        (F.col("z.__ls").cast("double") / denom).alias("level"),
        (F.col("z.__bs").cast("double") / denom).alias("trend"))


def mann_kendall_trend(df: DataFrame, key_col: str, time_col: str,
                       value_col: str) -> DataFrame:
    """Mann–Kendall monotone-trend test per key, exact where the
    statistic is integral: S = Σ sign(x_j − x_i) over time-ordered
    pairs, the tie-corrected variance numerator
    18·Var(S) = n(n−1)(2n+5) − Σ t(t−1)(2t+5), and the normal
    approximation z = (S ∓ 1)/sqrt(var) — S and the variance numerator
    are exact int64, z is ONE fixed-operand-order double expression
    (divide-then-sqrt, both IEEE-correctly-rounded), so even the
    real-valued z hash-pairs (the agg_corr_exact device).

    The pairwise sum runs on the per-key TIME-AGGREGATED relation
    (e.g. daily counts — hundreds of rows per key), never the raw
    events: the self-join is quadratic in *periods per key*, which is
    the bounded axis. Non-parametric (rank-based): the robust trend
    gate for drift monitoring where OLS slope is outlier-fragile —
    `theil_sen_slope` estimates the magnitude, this tests the
    direction.

    Keys with a single observation produce NO pairwise rows; they
    still surface (ADVICE r11) via a left join with s coalesced to 0
    — the output row reads n=1, s=0, var18_num=0, z=0,
    significant=false rather than silently vanishing."""
    a = df.select(F.col(key_col).alias("__k"),
                  F.col(time_col).alias("__t"),
                  F.col(value_col).alias("__v"))
    b = a.select(F.col("__k"), F.col("__t").alias("__t2"),
                 F.col("__v").alias("__v2"))
    pairs = a.join(b, "__k").filter(F.col("__t") < F.col("__t2"))
    s = pairs.groupBy("__k").agg(
        F.sum(F.signum(F.col("__v2") - F.col("__v")).cast("bigint"))
        .cast("bigint").alias("s"))
    n = a.groupBy("__k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (a.groupBy("__k", "__v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
            .groupBy("__k")
            .agg(F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
                 .cast("bigint").alias("tie_term")))
    j = (n.join(s, "__k", "left").join(ties, "__k")
         .withColumn("s", F.coalesce(F.col("s"),
                                     F.lit(0).cast("bigint"))))
    var18 = (F.expr("n * (n - 1) * (2 * n + 5)") - F.col("tie_term")) \
        .cast("bigint")
    s_adj = (F.when(F.col("s") > 0, F.col("s") - 1)
             .when(F.col("s") < 0, F.col("s") + 1)
             .otherwise(F.lit(0))).cast("bigint")
    z = F.when(F.col("var18_num") > 0,
               F.col("s_adj").cast("double")
               / F.sqrt(F.col("var18_num").cast("double") / 18.0)) \
        .otherwise(F.lit(0.0))
    return (j.select("__k", "n", "s", var18.alias("var18_num"),
                     s_adj.alias("s_adj"))
            .select(F.col("__k").alias(key_col), "n", "s", "var18_num",
                    z.alias("z"),
                    (F.abs(F.col("s_adj").cast("double"))
                     > F.lit(1.96)
                     * F.sqrt(F.col("var18_num").cast("double") / 18.0))
                    .alias("significant")))
