"""Connected components (operators/graph.py): fixpoint correctness vs a
driver-side union-find on random graphs, chain convergence (pointer
jumping), singleton handling, and the canonical-survivor contract."""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from yougile_etl_pipeline_spark.operators.graph import (
    canonical_docs,
    connected_components,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component = min node in component: min-root union keeps root minimal
    return {x: find(x) for x in range(n_nodes)}


def test_cc_matches_union_find_random(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
        edges = [(u, v) for u, v in edges if u != v]
        want = _union_find(n, edges)
        e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
        nodes = spark.range(n).select(F.col("id").alias("node"))
        # both paths must compute the identical fixpoint
        fast = dict(connected_components(e, nodes).collect())
        dist = dict(connected_components(e, nodes,
                                         driver_threshold=0).collect())
        assert fast == want, f"trial {trial} (driver path)"
        assert dist == want, f"trial {trial} (distributed path)"


def test_cc_long_chain_converges(spark):
    """A 200-node path graph has diameter 199 — plain min-propagation
    needs 199 rounds; pointer jumping must collapse it within max_iter
    (the 100 TB safety property for long near-dup chains)."""
    n = 200
    e = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                              "src long, dst long")
    got = connected_components(e, max_iter=25,
                               driver_threshold=0).collect()
    assert len(got) == n
    assert {r.component for r in got} == {0}


def test_cc_singletons_and_canonical(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (10, 11)],
                              "src long, dst long")
    nodes = spark.range(15).select(F.col("id").alias("node"))
    comp = connected_components(e, nodes)
    docs = spark.range(15).select(F.col("id").alias("doc_id"),
                                  (F.col("id") * 10).alias("payload"))
    kept = canonical_docs(docs, comp)
    rows = {r.doc_id: r.cluster_size for r in kept.collect()}
    # survivors: min of {1,2,3} and {10,11}, plus every singleton
    assert rows[1] == 3 and rows[10] == 2
    assert 2 not in rows and 3 not in rows and 11 not in rows
    singles = set(range(15)) - {1, 2, 3, 10, 11}
    assert all(rows[s] == 1 for s in singles)


def test_cc_raises_without_fixpoint_budget(spark):
    import pytest

    e = spark.createDataFrame([(i, i + 1) for i in range(20)],
                              "src long, dst long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(e, max_iter=1, driver_threshold=0)


def test_cc_fully_connected_blob(spark):
    """One dense component (every node linked to node 0) converges in the
    minimum rounds and labels everything 0."""
    e = spark.createDataFrame([(0, i) for i in range(1, 40)],
                              "src long, dst long")
    got = connected_components(e).collect()
    assert {r.component for r in got} == {0} and len(got) == 40

def test_cc_string_node_ids_fast_path(spark):
    """Doc ids are often hashes/UUIDs, not ints — the union-find fast
    path must keep native values (regression: it once int()-cast them)."""
    e = spark.createDataFrame([("aa", "bb"), ("bb", "cc"), ("xx", "yy")],
                              "src string, dst string")
    nodes = spark.createDataFrame([("aa",), ("bb",), ("cc",), ("xx",),
                                   ("yy",), ("zz",)], "node string")
    got = {r.node: r.component
           for r in connected_components(e, nodes).collect()}
    assert got == {"aa": "aa", "bb": "aa", "cc": "aa",
                   "xx": "xx", "yy": "xx", "zz": "zz"}


# ---------------------------------------------------------------------------
# pagerank_fixed_point
# ---------------------------------------------------------------------------

def _pr(spark, edges, **kw):
    from yougile_etl_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank"]
            for r in pagerank_fixed_point(df, **kw).collect()}


def test_pagerank_star_center_dominates(spark):
    # Undirected star: the hub must out-rank every leaf.
    leaves = [f"l{i}" for i in range(6)]
    edges = [("hub", l) for l in leaves] + [(l, "hub") for l in leaves]
    ranks = _pr(spark, edges, iterations=5)
    assert all(ranks["hub"] > ranks[l] for l in leaves)
    assert len(set(ranks[l] for l in leaves)) == 1  # symmetry preserved

def test_pagerank_mass_conserved_up_to_floor_loss(spark):
    # With symmetric edges nothing dangles: total rank stays within
    # floor-division loss of `scale` (each div loses < 1 unit per edge
    # per iteration) and never exceeds it.
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("c", "d"), ("d", "c")]
    ranks = _pr(spark, edges, iterations=4)
    total, scale = sum(ranks.values()), 10**12
    assert total <= scale
    assert total >= scale - 4 * (len(edges) + len(ranks)) * 100

def test_pagerank_partitioning_invariant(spark):
    # Identical bigint ranks at any parallelism (the point of
    # fixed-point arithmetic).
    import random
    rng = random.Random(7)
    edges = []
    for i in range(60):
        a, b = rng.randrange(20), rng.randrange(20)
        if a != b:
            edges += [(f"n{a}", f"n{b}"), (f"n{b}", f"n{a}")]
    df1 = spark.createDataFrame(edges, "src string, dst string").coalesce(1)
    df8 = spark.createDataFrame(edges, "src string, dst string") \
        .repartition(8)
    from yougile_etl_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )
    r1 = {r["node"]: r["rank"]
          for r in pagerank_fixed_point(df1, iterations=3).collect()}
    r8 = {r["node"]: r["rank"]
          for r in pagerank_fixed_point(df8, iterations=3).collect()}
    assert r1 == r8

def test_pagerank_rejects_zero_iterations(spark):
    import pytest as _pt

    from yougile_etl_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with _pt.raises(ValueError):
        pagerank_fixed_point(df, iterations=0)

def test_pagerank_empty_edges_returns_empty(spark):
    from yougile_etl_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )
    df = spark.createDataFrame([], "src string, dst string")
    out = pagerank_fixed_point(df, iterations=2)
    assert out.columns == ["node", "rank"] and out.count() == 0

def test_pagerank_trajectory_matches_independent_runs(spark):
    # The shared-prefix trajectory (VERDICT r10 #3) must be bit-equal
    # to N independent fixed-depth runs — checkpointing only truncates
    # lineage, never changes the integer arithmetic.
    import random

    from yougile_etl_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )
    rng = random.Random(11)
    edges = []
    for _ in range(50):
        a, b = rng.randrange(15), rng.randrange(15)
        if a != b:
            edges.append((f"n{a}", f"n{b}"))
    df = spark.createDataFrame(edges, "src string, dst string")
    traj = pagerank_fixed_point(df, iterations=3, return_trajectory=True)
    assert len(traj) == 3
    for depth, ranks in enumerate(traj, start=1):
        got = {r["node"]: r["rank"] for r in ranks.collect()}
        want = {r["node"]: r["rank"]
                for r in pagerank_fixed_point(
                    df, iterations=depth).collect()}
        assert got == want, f"trajectory diverged at depth {depth}"

def test_pagerank_trajectory_empty_edges(spark):
    from yougile_etl_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )
    df = spark.createDataFrame([], "src string, dst string")
    traj = pagerank_fixed_point(df, iterations=2, return_trajectory=True)
    assert len(traj) == 2
    assert all(t.count() == 0 for t in traj)


def test_triangle_count_known_graph(spark):
    # K4 has C(4,3)=4 triangles; edges given in mixed orientation with
    # a duplicate and a self-loop, which canonicalization must absorb.
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges += [(0, 1), (2, 2)]  # duplicate (reversed covers it) + loop
    df = spark.createDataFrame(edges, "src long, dst long")
    from yougile_etl_pipeline_spark.operators.graph import triangle_count

    assert triangle_count(df).collect()[0].n_triangles == 4


def test_triangle_count_triangle_free(spark):
    # a path and a 4-cycle have zero triangles
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    from yougile_etl_pipeline_spark.operators.graph import triangle_count

    assert triangle_count(df).collect()[0].n_triangles == 0


def test_triangle_count_random_vs_bruteforce(spark):
    from itertools import combinations

    from yougile_etl_pipeline_spark.operators.graph import triangle_count

    rng = random.Random(7)
    edges = {tuple(sorted(rng.sample(range(12), 2))) for _ in range(40)}
    expected = sum(1 for a, b, c in combinations(range(12), 3)
                   if (a, b) in edges and (b, c) in edges
                   and (a, c) in edges)
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    assert triangle_count(df).collect()[0].n_triangles == expected


# ---------------------------------------------------------------------------
# HITS hubs & authorities (r10 staging bank: graph_hits_scores)
# ---------------------------------------------------------------------------

def test_hits_scores_hand_checked(spark):
    """Star graph 1->3, 2->3, 3->4: after two unnormalized
    iterations, authority concentrates on 3 (pointed to by the best
    hubs) and hub mass on 1/2 (they point at the best authority).
    Hand-unrolled: h0=1 -> a1=(3:2, 4:1) -> h1=(1:2, 2:2, 3:1) ->
    a2=(3:4, 4:1) -> h2=(1:4, 2:4, 3:1)."""
    from yougile_etl_pipeline_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src long, dst long")
    got = {r["node"]: (r["hub"], r["auth"])
           for r in hits_scores(edges, iterations=2).collect()}
    assert got == {1: (4, 0), 2: (4, 0), 3: (1, 4), 4: (0, 1)}


def test_hits_scores_empty_and_single_edge(spark):
    from yougile_etl_pipeline_spark.operators.graph import hits_scores

    one = spark.createDataFrame([(7, 9)], "src long, dst long")
    got = {r["node"]: (r["hub"], r["auth"])
           for r in hits_scores(one, iterations=2).collect()}
    # a1=(9:1); h1=(7:1); a2=(9:1); h2=(7:1)
    assert got == {7: (1, 0), 9: (0, 1)}


def test_graph_ops_tolerate_conflicting_edge_columns(spark):
    """ADVICE r09: an edges frame that already carries a node/rank/
    hub/auth column must not produce ambiguous-reference errors or a
    wrong join resolution — the operators project edges down to
    internal names at entry."""
    from yougile_etl_pipeline_spark.operators.graph import (
        hits_scores,
        pagerank_fixed_point,
        pagerank_personalized,
    )

    edges = spark.createDataFrame(
        [(1, 3, 99, 99, 99, 99), (2, 3, 99, 99, 99, 99),
         (3, 4, 99, 99, 99, 99)],
        "src long, dst long, node long, rank long, hub long, auth long")

    got = {r["node"]: (r["hub"], r["auth"])
           for r in hits_scores(edges, iterations=2).collect()}
    assert got == {1: (4, 0), 2: (4, 0), 3: (1, 4), 4: (0, 1)}

    clean = edges.select("src", "dst")
    pr_clean = {r["node"]: r["rank"]
                for r in pagerank_fixed_point(clean).collect()}
    pr_dirty = {r["node"]: r["rank"]
                for r in pagerank_fixed_point(edges).collect()}
    assert pr_clean == pr_dirty

    seeds = spark.createDataFrame([(1,)], "node long")
    pp_clean = {r["node"]: r["rank"]
                for r in pagerank_personalized(clean, seeds).collect()}
    pp_dirty = {r["node"]: r["rank"]
                for r in pagerank_personalized(edges, seeds).collect()}
    assert pp_clean == pp_dirty


def test_degree_assortativity_hand_checked(spark):
    """Chain 1->2->3: edges (1,2),(2,3). Degrees: out 1=1,2=1; in 2=1,
    3=1. Pairs (x,y) = (1,1),(1,1) -> zero variance on both sides ->
    NULL r. Star 1->2, 1->3, 2->3: out 1=2, 2=1; in 2=1, 3=2. Pairs:
    (2,1),(2,2),(1,2). n=3 sx=5 sy=5 sxx=9 syy=9 sxy=8: num=24-25=-1,
    denx=27-25=2, deny=2 -> r = -1/2 = -0.5."""
    from yougile_etl_pipeline_spark.operators.graph import (
        degree_assortativity,
    )

    chain = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    row = degree_assortativity(chain).collect()[0]
    assert (row["n_edges"], row["sx"], row["sy"]) == (2, 2, 2)
    assert row["assortativity"] is None  # zero variance

    star = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long")
    row = degree_assortativity(star).collect()[0]
    assert (row["n_edges"], row["sx"], row["sy"], row["sxx"],
            row["syy"], row["sxy"]) == (3, 5, 5, 9, 9, 8)
    assert abs(row["assortativity"] - (-0.5)) < 1e-12


def test_reciprocity_hand_checked(spark):
    from yougile_etl_pipeline_spark.operators.graph import reciprocity

    # 1<->2 mutual, 1->3 one-way, a self-loop and a duplicate edge
    # that must both be ignored
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 3), (1, 2)], "src long, dst long")
    row = reciprocity(edges).collect()[0]
    assert (row["n_edges"], row["n_reciprocal"]) == (3, 2)
    assert row["reciprocity_ppm"] == 666666  # floor(2e6/3)

    empty = spark.createDataFrame([], "src long, dst long")
    row = reciprocity(empty).collect()[0]
    assert (row["n_edges"], row["n_reciprocal"]) == (0, 0)
    assert row["reciprocity_ppm"] is None


def test_katz_centrality_hand_checked(spark):
    """1->3, 2->3, 3->4, scale=100, alpha=1/5, 2 iterations:
    x0 = 100 everywhere; x1 = 100 + insum div 5 -> (100,100,140,120);
    x2: node 3 gets (100+100) div 5 = 40 -> 140, node 4 gets
    140 div 5 = 28 -> 128."""
    from yougile_etl_pipeline_spark.operators.graph import katz_centrality

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src long, dst long")
    got = {r["node"]: r["katz"] for r in katz_centrality(
        edges, iterations=2, scale=100, alpha_inv=5).collect()}
    assert got == {1: 100, 2: 100, 3: 140, 4: 128}
    # conflicting-column defense, same as the other graph ops
    dirty = spark.createDataFrame(
        [(1, 3, 9), (2, 3, 9), (3, 4, 9)],
        "src long, dst long, katz long")
    got2 = {r["node"]: r["katz"] for r in katz_centrality(
        dirty, iterations=2, scale=100, alpha_inv=5).collect()}
    assert got2 == got


def test_clustering_coefficients_hand_checked(spark):
    """Triangle 1-2-3 plus pendant 3-4 (undirected, given as directed
    one-way edges): nodes 1,2 have k=2, one closed pair -> 1.0; node 3
    has k=3, neighbors {1,2,4}, only (1,2) closed of 3 pairs ->
    1/3; node 4 has k=1 -> NULL."""
    from yougile_etl_pipeline_spark.operators.graph import (
        clustering_coefficients,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long")
    got = {r["node"]: (r["degree"], r["triangles"], r["coeff_ppm"])
           for r in clustering_coefficients(edges).collect()}
    assert got == {1: (2, 1, 1000000), 2: (2, 1, 1000000),
                   3: (3, 1, 333333), 4: (1, 0, None)}
