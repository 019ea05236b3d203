"""TPC-H completion: the ten classic shapes not yet in the registry
(Q2, Q6, Q7, Q9, Q12, Q13, Q15, Q18, Q20, Q21) — with the 12 shapes in
`registry.py`/`registry_analytics.py` this covers all 22 TPC-H queries.

The driver's testdata omits `partsupp` and the lineitem date triplet
(`l_commitdate`/`l_receiptdate`) and `l_shipmode` (TESTDATA.md), so the
shapes that reference them are adapted, preserving the *plan* shape (the
thing a query engine is graded on), with the substitution documented per
query:

* partsupp supply-cost → per-(part,supplier) MIN(l_extendedprice) derived
  from lineitem (Q2), p_retailprice·quantity as the cost leg (Q9), and a
  shipped-quantity HAVING threshold (Q20);
* commit/receipt lateness → `l_returnflag = 'R'` as the "late/failed"
  line marker (Q21) and a shipped-after-order non-equi predicate (Q12).

Cross-engine determinism rules follow the module docstring of
`registry_analytics.py`: aggregate in DECIMAL(20,6) (cast the IEEE
product once, then exact sums), CAST to DOUBLE only at the boundary,
dates rendered via date_format/strftime, counts as BIGINT. Threshold
equality tests (Q2 min, Q15 max, Q18/Q20 HAVING) compare DECIMAL values,
so ties are exact on both engines, never last-ulp float flips.

Scale notes (100 TB): every shape here is join + grouped aggregation on
equi-keys — partial aggregation map-side, AQE-sized shuffles; the
correlated min/max subqueries (Q2, Q15) are expressed as a window min /
scalar-subquery max over an already-aggregated (small) relation, not a
per-row rescan of the fact; Q21's EXISTS/NOT-EXISTS pair decorrelates to
two semi/anti joins on `l_orderkey` — three scans of lineitem but zero
nested loops.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from yougile_etl_pipeline_spark.registry import _dec, register
from yougile_etl_pipeline_spark.sources.tables import (
    load_table,
    load_tables,
    register_temp_views,
)

_REV = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))"


def _rev():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(20,6)")


@register("sql_q2_min_cost_supplier", """
WITH cost AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(20,6))) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT c.partkey, c.suppkey, c.supply_cost,
         s_name, s_acctbal, n_name
  FROM cost c
  JOIN supplier ON s_suppkey = c.suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
       CAST(supply_cost AS DOUBLE) AS supply_cost
FROM part JOIN eu ON partkey = p_partkey
WHERE p_size = 9
  AND supply_cost = (SELECT MIN(e2.supply_cost) FROM eu e2
                     WHERE e2.partkey = p_partkey)
""")
def sql_q2_min_cost_supplier(spark, sf):
    # TPC-H Q2 shape: cheapest regional supplier per part — correlated
    # MIN subquery matched back by equality. partsupp is derived:
    # supply_cost = per-(part,supplier) MIN lineitem price (exact
    # DECIMAL, so the equality match can't float-flip). The correlated
    # subquery is a window MIN over the aggregated (part,supplier)
    # relation — already grouped, ~|part|·|supp-per-part| rows, never a
    # rescan of lineitem per part.
    t = load_tables(spark, sf,
                    ("lineitem", "part", "supplier", "nation", "region"))
    cost = (t["lineitem"]
            .groupBy(F.col("l_partkey").alias("partkey"),
                     F.col("l_suppkey").alias("suppkey"))
            .agg(F.min(_dec("l_extendedprice")).alias("supply_cost")))
    eu = (cost
          .join(t["supplier"], cost.suppkey == F.col("s_suppkey"))
          .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
          .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
          .filter(F.col("r_name") == "EUROPE")
          .select("partkey", "supply_cost", "s_name", "s_acctbal", "n_name"))
    w = Window.partitionBy("partkey")
    best = (eu.withColumn("min_cost", F.min("supply_cost").over(w))
              .filter(F.col("supply_cost") == F.col("min_cost")))
    return (t["part"].filter(F.col("p_size") == 9)
            .join(best, F.col("p_partkey") == best.partkey)
            .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
                    F.col("supply_cost").cast("double")
                     .alias("supply_cost")))


@register("sql_q6_forecast_revenue", f"""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(20,6)))
            AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def sql_q6_forecast_revenue(spark, sf):
    # TPC-H Q6: pure scan-filter-aggregate — every predicate pushes to
    # the parquet scan (date + two numeric ranges hit row-group stats),
    # then a single global DECIMAL sum. The IEEE product is cast to
    # DECIMAL once per row (deterministic), summed exactly.
    li = load_table(spark, sf, "lineitem")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    return (li.filter((F.col("l_shipdate") >= lo)
                      & (F.col("l_shipdate") < hi)
                      & (F.col("l_discount") >= 0.05)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(F.sum((F.col("l_extendedprice") * F.col("l_discount"))
                       .cast("decimal(20,6)")).cast("double")
                  .alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


@register("sql_q7_nation_volume", f"""
SELECT supp_nation, cust_nation, yr, CAST(SUM(vol) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS yr, {_REV} AS vol
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, yr
""")
def sql_q7_nation_volume(spark, sf):
    # TPC-H Q7: bilateral trade volume — five-way join where the two
    # nation legs are broadcast and the disjunctive nation-pair filter
    # prunes early (applied right after each nation join, not at the
    # end), so the fact shuffle carries only the two nations' rows.
    t = load_tables(spark, sf,
                    ("supplier", "lineitem", "orders", "customer", "nation"))
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"),
                            F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"),
                            F.col("n_name").alias("cust_nation"))
    lo = F.lit("1995-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (t["supplier"]
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
            .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
            .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
            .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
            .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
            .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("yr"))
            .agg(F.sum(_rev()).cast("double").alias("revenue")))


@register("sql_q9_product_profit", """
SELECT nation, yr, CAST(SUM(amount) AS DOUBLE) AS profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS yr,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))
         - CAST(p_retailprice * l_quantity AS DECIMAL(20,6)) AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE p_name LIKE 'red%'
)
GROUP BY nation, yr
""")
def sql_q9_product_profit(spark, sf):
    # TPC-H Q9 shape: profit by supplier nation and order year for one
    # product family. partsupp's ps_supplycost leg is substituted by
    # p_retailprice·l_quantity (the same join-then-arithmetic shape; the
    # cost column simply rides the part dimension instead). The p_name
    # filter prunes part before the fact join; part/supplier/nation
    # broadcast, lineitem⋈orders shuffles on orderkey.
    t = load_tables(spark, sf,
                    ("lineitem", "part", "supplier", "orders", "nation"))
    amount = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(20,6)")
        - (F.col("p_retailprice") * F.col("l_quantity"))
        .cast("decimal(20,6)")
    )
    part = t["part"].filter(F.col("p_name").like("red%"))
    return (t["lineitem"]
            .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(t["supplier"]),
                  F.col("s_suppkey") == F.col("l_suppkey"))
            .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
            .join(F.broadcast(t["nation"]),
                  F.col("n_nationkey") == F.col("s_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("yr"))
            .agg(F.sum(amount).cast("double").alias("profit")))


@register("sql_q12_late_lines_priority", """
SELECT l_returnflag,
  CAST(count_if(o_orderpriority IN ('1-URGENT', '2-HIGH')) AS BIGINT)
    AS high_line_count,
  CAST(count_if(o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS BIGINT)
    AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate
  AND year(l_shipdate) = 1996
GROUP BY l_returnflag
""")
def sql_q12_late_lines_priority(spark, sf):
    # TPC-H Q12 shape: priority mix per shipping class. l_shipmode is
    # absent from the fixture; l_returnflag is the grouping class, and
    # the commit<receipt lateness predicate becomes the cross-table
    # non-equi predicate shipdate>=orderdate (evaluated post-join, same
    # plan position). CASE-counting both branches in one pass.
    t = load_tables(spark, sf, ("orders", "lineitem"))
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (t["orders"]
            .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
            .filter((F.col("l_shipdate") >= F.col("o_orderdate"))
                    & (F.year("l_shipdate") == 1996))
            .groupBy("l_returnflag")
            .agg(F.count_if(is_high).alias("high_line_count"),
                 F.count_if(~is_high).alias("low_line_count")))


@register("sql_q13_order_distribution", """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
""")
def sql_q13_order_distribution(spark, sf):
    # TPC-H Q13: customer order-count distribution — LEFT join with the
    # extra predicate in the ON clause (filtering the right side only;
    # customers with zero qualifying orders must survive with count 0 —
    # a WHERE would wrongly drop them), then a re-aggregation of the
    # counts. Two shuffles, both on small grouped relations.
    t = load_tables(spark, sf, ("customer", "orders"))
    per_cust = (t["customer"].join(
        t["orders"],
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "5-LOW"),
        "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist"))


@register("sql_q15_top_supplier", f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""")
def sql_q15_top_supplier(spark, sf):
    # TPC-H Q15: top supplier by quarterly revenue — the view + scalar
    # MAX subquery. The max is taken over the aggregated per-supplier
    # relation (|supplier| rows, not the fact) via a broadcast scalar;
    # DECIMAL sums make the equality tie-exact, so multi-winner ties
    # return identical row sets on both engines.
    #
    # Plan note: Catalyst plans the scalar-threshold join as a
    # BroadcastNestedLoopJoin on a ONE-ROW build side — expected and
    # optimal here (effectively a map-side filter; the alternative, an
    # unpartitioned window over revenue, serializes |supplier| rows
    # into one task at scale). plan_profile's has_nested_loop_join
    # gate must whitelist Q15; don't "fix" this into a window.
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    revenue = (li.filter((F.col("l_shipdate") >= lo)
                         & (F.col("l_shipdate") < hi))
               .groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(F.sum(_rev()).alias("total_revenue")))
    best = revenue.agg(F.max("total_revenue").alias("mx"))
    return (supp.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
            .join(F.broadcast(best),
                  F.col("total_revenue") == F.col("mx"))
            .select("s_suppkey", "s_name",
                    F.col("total_revenue").cast("double")
                     .alias("total_revenue")))


@register("sql_q18_large_orders", """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(20,6))) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""")
def sql_q18_large_orders(spark, sf):
    # TPC-H Q18: large-volume orders — IN over a grouped-HAVING
    # subquery. Catalyst plans the IN as a left-semi join against the
    # aggregated orderkey set (tiny after the >300 threshold, p99.9 of
    # per-order quantity is ~337), so the re-join back to lineitem is
    # semi-pruned before the final group. DECIMAL threshold: exact.
    register_temp_views(spark, sf)
    return spark.sql("""
        SELECT c_name, c_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS order_date,
               o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
                 AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(20,6))) > 300)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """)


@register("sql_q20_excess_suppliers", """
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = 3
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE 'red%')
      AND year(l_shipdate) = 1996
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(20,6)))
           > CAST(400 AS DECIMAL(20,6)))
""")
def sql_q20_excess_suppliers(spark, sf):
    # TPC-H Q20 shape: suppliers who moved excess stock of one product
    # family — two nested IN subqueries, the inner one itself grouped
    # with a HAVING threshold (partsupp availqty leg → shipped-quantity
    # sum). Catalyst: part-IN becomes a broadcast semi join inside the
    # lineitem scan, the outer IN a semi join on the ~|supplier| HAVING
    # survivors. Planner-surface entry, kept in SQL like Q16/Q22.
    register_temp_views(spark, sf)
    return spark.sql("""
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_regionkey = 3
          AND s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'red%')
              AND year(l_shipdate) = 1996
            GROUP BY l_suppkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(20,6)))
                   > CAST(400 AS DECIMAL(20,6)))
    """)


@register("sql_q21_waiting_suppliers", """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n_regionkey = 0
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""")
def sql_q21_waiting_suppliers(spark, sf):
    # TPC-H Q21 shape: the sole at-fault supplier in multi-supplier
    # orders — the EXISTS + NOT EXISTS self-join pair, the hardest
    # decorrelation in the suite. Lateness (commit<receipt, absent from
    # the fixture) is marked by l_returnflag='R'. Catalyst decorrelates
    # to a semi join (some other supplier in the order) and an anti join
    # (no other *failing* supplier) on l_orderkey — three lineitem scans,
    # no nested loop; all three shuffle on the same orderkey so AQE
    # reuses the exchange partitioning.
    register_temp_views(spark, sf)
    return spark.sql("""
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND n_regionkey = 0
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
    """)


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
