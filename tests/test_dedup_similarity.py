"""Behavioral tests for dedup + similarity beyond the oracle checks:
MinHash/SimHash actually *detect* near-duplicates, ANN recall is sane."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from yougile_etl_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    shingle_jaccard_pairs,
    simhash,
)
from yougile_etl_pipeline_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    rows = [
        (1, base, "en"),
        (2, base, "en"),                                   # exact dup
        (3, base.replace("green", "dark"), "en"),          # near dup
        (4, "completely different words about spark query engines and "
            "distributed shuffle partitioning strategies here", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup_clusters(near_dup_docs):
    out = {r.canonical_id: r.dup_count
           for r in exact_dedup(near_dup_docs, "doc_id", "text").collect()}
    assert out[1] == 2          # docs 1+2 share a fingerprint
    assert out[3] == 1 and out[4] == 1


def test_jaccard_finds_near_dups(near_dup_docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in shingle_jaccard_pairs(
                 near_dup_docs, "doc_id", "text",
                 threshold=0.5, block_cols=["lang"]).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_minhash_lsh_candidates(near_dup_docs):
    pairs = {(r.doc_a, r.doc_b)
             for r in minhash_lsh_pairs(near_dup_docs, "doc_id", "text",
                                        n_hashes=8, bands=4).collect()}
    assert (1, 2) in pairs            # identical docs always collide
    assert (1, 4) not in pairs        # unrelated docs shouldn't


def test_simhash_hamming_property(near_dup_docs):
    sigs = {r.doc: r.simhash64
            for r in simhash(near_dup_docs, "doc_id", "text").collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert sigs[1] == sigs[2]                          # identical text
    assert ham(sigs[1], sigs[3]) < ham(sigs[1], sigs[4])  # near < far


def test_ann_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {(r.query_id, r.match_id)
             for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.match_id)
              for r in lsh_bucket_topk(emb, q, k=5).collect()}
    # every ANN hit must be a real neighbor-candidate (same-bucket subset
    # of the corpus); recall is lossy but must be nonzero and only return
    # pairs the exact ranking could justify
    assert approx, "LSH returned nothing — buckets degenerate"
    recall = len(exact & approx) / len(exact)
    assert recall > 0.2, f"suspiciously low recall {recall}"


def test_ivf_recall_and_bucket_locality(spark):
    from yougile_etl_pipeline_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    centroids = emb.filter(F.col("vec_id") < 256)
    exact = {(r.query_id, r.match_id)
             for r in brute_force_topk(emb, q, k=5).collect()}
    ivf = {(r.query_id, r.match_id)
           for r in ivf_topk(emb, q, centroids, k=5).collect()}
    assert ivf, "IVF returned nothing"
    # 1-probe IVF on unclustered vectors: recall is bounded but must be
    # meaningfully above random (5/499 ≈ 0.01)
    recall = len(exact & ivf) / len(exact)
    assert recall > 0.1, f"IVF recall degenerate: {recall}"


def test_ivf_recall_monotone_in_nprobe(spark):
    """The IVF recall knob: recall@k never decreases as nprobe grows, and
    at nprobe == n_centroids the probe covers everything ⇒ recall 1.0."""
    from yougile_etl_pipeline_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    centroids = emb.filter(F.col("vec_id") < 16)    # 16 lists
    exact = {(r.query_id, r.match_id)
             for r in brute_force_topk(emb, q, k=5).collect()}
    recalls = []
    for nprobe in (1, 4, 16):
        got = {(r.query_id, r.match_id)
               for r in ivf_topk(emb, q, centroids, k=5,
                                 nprobe=nprobe).collect()}
        recalls.append(len(exact & got) / len(exact))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[-1] == 1.0, f"full probe must be exact: {recalls}"


def test_np_paths_match_hof_bitwise(spark):
    """The numpy-scored fast paths return byte-identical results to the
    all-HOF formulations (winner sets agree; winners re-scored exact)."""
    from yougile_etl_pipeline_spark.operators.similarity import (
        brute_force_topk_np,
        lsh_bucket_topk_np,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    for hof_fn, np_fn in ((brute_force_topk, brute_force_topk_np),
                          (lsh_bucket_topk, lsh_bucket_topk_np)):
        hof = sorted(map(tuple, hof_fn(emb, q, k=5).collect()))
        fast = sorted(map(tuple, np_fn(emb, q, k=5).collect()))
        assert hof == fast, f"{np_fn.__name__} diverged from HOF"


def test_ivf_np_matches_hof_bitwise(spark):
    from yougile_etl_pipeline_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_np,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    centroids = emb.filter(F.col("vec_id") < 256)
    for nprobe in (1, 3):
        hof = sorted(map(tuple,
                         ivf_topk(emb, q, centroids, k=5,
                                  nprobe=nprobe).collect()))
        fast = sorted(map(tuple,
                          ivf_topk_np(emb, q, centroids, k=5,
                                      nprobe=nprobe).collect()))
        assert hof == fast, f"ivf np diverged at nprobe={nprobe}"


def test_lsh_bucket_width_bounds_bucket_size(spark):
    """planes_per_table is the occupancy knob: 2^P buckets, so raising P
    must shrink the biggest bucket — the 100 TB safety property."""
    from yougile_etl_pipeline_spark.operators.similarity import (
        hyperplane_bucket,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    max_sizes = {}
    for p in (2, 6):
        sizes = (emb.select(hyperplane_bucket("embedding", 0,
                                              planes_per_table=p)
                            .alias("key"))
                 .groupBy("key").count())
        max_sizes[p] = sizes.agg(F.max("count")).collect()[0][0]
        assert sizes.count() <= 2 ** p
    assert max_sizes[6] < max_sizes[2] <= n
    # sign-bucket occupancy on random vectors ≈ N/2^P; allow 4× slack
    assert max_sizes[6] < 4 * n / 2 ** 6


def test_shingle_df_cap_bounds_candidates(spark):
    """A hot shingle shared by every doc makes the uncapped self-join
    quadratic; the DF cap removes it and candidates collapse."""
    hot = "alpha beta gamma"        # one shared trigram in every doc
    rows = [(i, f"{hot} unique{i} token{i} filler{i} word{i}", "en")
            for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    uncapped = shingle_jaccard_pairs(docs, "doc_id", "text", threshold=0.0,
                                     max_shingle_df=None).count()
    capped = shingle_jaccard_pairs(docs, "doc_id", "text", threshold=0.0,
                                   max_shingle_df=5).count()
    assert uncapped == 20 * 19 // 2     # all-pairs blowup
    assert capped == 0                   # hot shingle dropped pre-join


def test_simhash_portable_matches_xxhash_behavior(near_dup_docs):
    """The oracle-paired md5-window SimHash preserves the Hamming
    property of the xxhash64 variant (near-dup < far) on 60 bits."""
    from yougile_etl_pipeline_spark.operators.dedup import simhash_portable

    sigs = {r.doc: r.simhash60
            for r in simhash_portable(near_dup_docs,
                                      "doc_id", "text").collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 60) - 1)).count("1")
    assert sigs[1] == sigs[2]
    assert ham(sigs[1], sigs[3]) < ham(sigs[1], sigs[4])


def test_simhash_ham_pairs_exact_recall(spark):
    """Banded Hamming join must find EXACTLY the pairs within distance 3:
    pigeonhole guarantees recall (<=3 diffs over 4 bands leave one band
    clean); the bit_count verify kills everything further away."""
    from yougile_etl_pipeline_spark.operators.dedup import simhash_ham_pairs

    base = 0b101010101010101010101010101010101010101010101010101010101010
    sigs = [
        (1, base),
        (2, base ^ 0b1),                      # d=1
        (3, base ^ 0b111),                    # d=3 (all in band 0)
        (4, base ^ (1 << 3) ^ (1 << 17) ^ (1 << 33) ^ (1 << 48)),  # d=4 spread
        (5, base ^ ((1 << 15) | (1 << 16))),  # d=2 in band 1
    ]
    df = spark.createDataFrame(sigs, "doc long, simhash60 long")
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in simhash_ham_pairs(df).collect()}
    assert got[(1, 2)] == 1 and got[(1, 3)] == 3 and got[(1, 5)] == 2
    assert (1, 4) not in got                  # d=4 excluded by verify
    assert got[(2, 3)] == 2 and got[(2, 5)] == 3
    # doc4 is d>=3 from everything except... compute: vs 2: 5, vs 3: 7, vs 5: 6
    assert not any(4 in p for p in got)


def test_kmeans_train_monotone_quality(spark):
    """Spherical k-means: mean cosine-to-assigned-centroid must not
    decrease across Lloyd iterations (each step optimizes it)."""
    from yougile_etl_pipeline_spark.operators.similarity import (
        ivf_assign,
        kmeans_train,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16)

    def quality(c):
        a = ivf_assign(emb, c, nprobe=1)
        cv = c.select(F.col("vec_id").alias("centroid_id"),
                      F.col("embedding").alias("__cv"))
        dot = F.aggregate(
            F.zip_with("embedding", "__cv", lambda x, y: x * y),
            F.lit(0.0), lambda acc, v: acc + v)
        nrm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
            F.zip_with(col, col, lambda x, y: x * y),
            F.lit(0.0), lambda acc, v: acc + v))
        return (a.join(cv, "centroid_id")
                 .select((dot / (nrm("embedding") * nrm("__cv")))
                         .alias("cos"))
                 .agg(F.avg("cos")).collect()[0][0])

    q0 = quality(cents)
    c1 = kmeans_train(emb, cents, iters=1)
    q1 = quality(c1)
    c2 = kmeans_train(emb, c1, iters=1)
    q2 = quality(c2)
    assert q1 >= q0 - 1e-9 and q2 >= q1 - 1e-9
    assert q2 > q0  # and it actually improves on this corpus


def test_ivf_with_trained_centroids(spark):
    """End-to-end IVF training story: kmeans-trained centroids plug into
    ivf_topk unchanged — full k results per query, sane 1-probe recall,
    and recall stays monotone in nprobe (1-probe recall is NOT guaranteed
    to beat the raw sample — tighter cells can split true neighbor
    pairs — but multiprobe must recover it)."""
    from yougile_etl_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_train,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {(r.query_id, r.match_id)
             for r in brute_force_topk(emb, queries, k=5).collect()}

    trained = kmeans_train(emb, emb.filter(F.col("vec_id") < 16), iters=2)

    def recall(nprobe):
        rows = ivf_topk(emb, queries, trained, k=5, nprobe=nprobe).collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r.query_id, 0)
            per_q[r.query_id] += 1
        assert all(v == 5 for v in per_q.values()) and len(per_q) == 8
        return len({(r.query_id, r.match_id) for r in rows} & exact) / len(exact)

    r1, r4 = recall(1), recall(4)
    assert 0.5 <= r1 <= 1.0
    assert r4 >= r1 - 1e-9


def test_np_topk_tie_break_on_duplicate_vectors(spark):
    """Exact-duplicate embeddings (the dedup-corpus norm) produce score
    ties at the k-th slot: the numpy paths must pick the same candidate
    SET as the HOF row_number(score DESC, match_id) order."""
    from yougile_etl_pipeline_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_np,
    )

    base = load_table(spark, SF_SMOKE, "embeddings").filter(
        F.col("vec_id") < 20)
    # clone every vector under new ids -> every score appears twice
    dup = base.select((F.col("vec_id") + 1000).alias("vec_id"),
                      "embedding", "label")
    corpus = base.unionByName(dup)
    q = base.filter(F.col("vec_id") < 4)
    hof = sorted(map(tuple, brute_force_topk(corpus, q, k=5).collect()))
    fast = sorted(map(tuple, brute_force_topk_np(corpus, q, k=5).collect()))
    assert hof == fast


def test_dedup_incremental_statuses_and_idempotence(spark):
    from yougile_etl_pipeline_spark.operators.dedup import (
        dedup_incremental,
        fingerprint_exact,
    )
    corpus = spark.createDataFrame(
        [(1, "already ingested doc")], "doc_id long, text string")
    store = corpus.select(fingerprint_exact("text").alias("fp"))
    batch = spark.createDataFrame(
        [(10, "already ingested doc"),      # in the store -> known_dup
         (11, "fresh doc one"),             # unseen -> new
         (12, "fresh doc two"),             # unseen, duplicated in-batch
         (13, "fresh doc two")],            # larger id -> batch_dup
        "doc_id long, text string")
    out = {r.doc_id: r.status
           for r in dedup_incremental(batch, store).collect()}
    assert out == {10: "known_dup", 11: "new", 12: "new", 13: "batch_dup"}

    # Appending the 'new' fingerprints then replaying the SAME batch must
    # yield zero 'new'/'batch_dup' survivors — the exactly-once contract.
    res = dedup_incremental(batch, store)
    store2 = store.unionByName(
        res.filter(F.col("status") == "new").select("fp"))
    replay = {r.status for r in dedup_incremental(batch, store2).collect()}
    assert replay == {"known_dup"}


def test_embedding_decontaminate_flags_planted_paraphrase(spark):
    from yougile_etl_pipeline_spark.operators.similarity import (
        embedding_decontaminate,
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    corpus = spark.createDataFrame(
        [(1, [2.0, 0.0, 0.0, 0.0]),    # scaled copy of bench 100 -> cos 1
         (2, [0.9, 0.1, 0.0, 0.0]),    # near bench 100
         (3, [0.0, 0.0, 1.0, 0.0])],   # orthogonal to both
        "vec_id long, embedding array<double>")
    out = {r.vec_id: (r.max_benchmark_cos, r.contaminated)
           for r in embedding_decontaminate(corpus, bench,
                                            threshold=0.9).collect()}
    assert out[1][1] and abs(out[1][0] - 1.0) < 1e-12
    assert out[2][1] and out[2][0] > 0.9
    assert not out[3][1] and out[3][0] == 0.0


def test_ann_sizing_report_formulas(spark):
    # The report must reproduce the sizing math that retuned the r04
    # ANN knobs: on the near-isotropic synthetic embeddings the
    # neighbor angle is ~70 degrees, per-table collision ~0.14, and the
    # recommended table count lands in the empirically-validated range
    # (L=18 measured recall 0.95 at sf0.1; the sf0.001 corpus is
    # smaller so the angle — and hence L — may differ slightly).
    import math

    from yougile_etl_pipeline_spark.operators.similarity import (
        ann_sizing_report,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rpt = ann_sizing_report(emb, emb.filter(F.col("vec_id") < 4),
                            k=5, target_recall=0.95)
    # internal consistency: every derived number follows its formula
    assert rpt["n_corpus"] == emb.count()
    theta = math.acos(rpt["mean_neighbor_cos"])
    assert abs(rpt["lsh_p_plane"] - (1 - theta / math.pi)) < 1e-12
    assert abs(rpt["lsh_p_table"] - rpt["lsh_p_plane"] ** 4) < 1e-12
    L = rpt["lsh_tables_for_target"]
    # L is the smallest integer hitting the target under the model
    assert 1 - (1 - rpt["lsh_p_table"]) ** L >= 0.95
    assert L == 1 or 1 - (1 - rpt["lsh_p_table"]) ** (L - 1) < 0.95
    assert rpt["ivf_n_centroids"] == round(math.sqrt(rpt["n_corpus"]))
    # geometry sanity on this corpus: near-isotropic, weak neighbors
    assert 0.2 < rpt["mean_neighbor_cos"] < 0.7
    assert rpt["lsh_tables_for_target"] >= 4


def test_brute_force_np_enforces_query_collect_cap(spark, monkeypatch):
    """The driver-side query collect is a contract, not an assumption:
    exceeding the cap raises with guidance instead of materializing an
    unbounded driver matrix."""
    import pytest

    from yougile_etl_pipeline_spark.operators import similarity as S

    df = spark.range(5).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))
    monkeypatch.setattr(S, "_MAX_COLLECTED_QUERIES", 3)
    with pytest.raises(ValueError, match="collects the query side"):
        S.brute_force_topk_np(df, df, k=2)


def test_minhash_bucket_cap_kills_mega_cluster(spark):
    """VERDICT r05 advisory #1: a duplicate cluster of c identical docs
    emits O(c²) candidate pairs through the band self-join unless the
    per-(band, key) bucket cap drops its (hot) buckets. The cap must
    remove the mega-cluster's quadratic pair list while leaving small
    genuine near-dup pairs untouched."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    mega = [(i, base + " boilerplate footer", "en") for i in range(1000)]
    # distinct near-dup pair well away from the mega-cluster ids
    small = [(5001, base.replace("green", "dark"), "en"),
             (5002, base.replace("green", "dark") + " extra", "en")]
    docs = spark.createDataFrame(mega + small,
                                 "doc_id long, text string, lang string")

    capped = minhash_lsh_pairs(docs, "doc_id", "text",
                               max_bucket_size=100)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # the 1000-copy cluster's 499,500 pairs are gone...
    assert not any(a < 1000 and b < 1000 for a, b in got), (
        "mega-cluster pairs survived the bucket cap")
    # ...but the small near-dup pair still surfaces
    assert (5001, 5002) in got

    # default (None) preserves the quadratic behavior the certified
    # query documents — spot-check on a 50-copy cluster (50·49/2)
    smalln = spark.createDataFrame(mega[:50],
                                   "doc_id long, text string, lang string")
    n = minhash_lsh_pairs(smalln, "doc_id", "text").count()
    assert n == 50 * 49 // 2


def test_hyperplane_prefix_property_and_bucketed_filter_equivalence(spark):
    """The seeded hyperplanes RNG is consumed table-by-table, so table
    t's planes are independent of n_tables — the property that lets
    sim_lsh_recall_sweep derive every L-table arm as ``tbl < L`` of ONE
    18-table bucketed relation (VERDICT r14 #3). Assert it directly,
    then assert the filtered relation equals the natively-built one."""
    from yougile_etl_pipeline_spark.operators.similarity import (
        _bucketed_np,
        hyperplanes,
    )

    assert hyperplanes(2, 4) == hyperplanes(18, 4)[:2]
    assert hyperplanes(6, 4) == hyperplanes(18, 4)[:6]

    from yougile_etl_pipeline_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings") \
        .filter("vec_id < 40")
    full = _bucketed_np(emb, "match_id", "c_vec", "vec_id",
                        "embedding", 18, 4)
    native = _bucketed_np(emb, "match_id", "c_vec", "vec_id",
                          "embedding", 6, 4)
    a = {(r["match_id"], r["tbl"], r["key"])
         for r in full.filter("tbl < 6").collect()}
    b = {(r["match_id"], r["tbl"], r["key"]) for r in native.collect()}
    assert a == b


def test_minhash_decontam_cross_corpus(spark):
    """A train doc that is a light paraphrase of a bench doc still
    collides on >= 1 band; an unrelated train doc never appears."""
    from yougile_etl_pipeline_spark.operators.dedup import (
        minhash_decontam,
    )

    bench_text = ("alpha beta gamma delta epsilon zeta eta theta "
                  "iota kappa lambda mu nu xi omicron pi rho sigma")
    train = spark.createDataFrame(
        [(0, bench_text),                      # verbatim copy
         (1, bench_text + " extra tail"),      # light edit
         (2, "totally unrelated words none shared at all here ok")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            minhash_decontam(train, bench, "doc_id", "text").collect()}
    assert 0 in rows and rows[0]["max_bands"] == 4  # identical: all bands
    assert 1 in rows and rows[1]["n_bench_docs"] == 1
    assert 2 not in rows
