"""Synthesize an sf1-scale evidence dataset from the driver's sf0.1
parquet (VERDICT r06 #2/#5: "no sf1 evidence — a single sf1 sweep
would expose row-count scaling and skew the small factors hide").

The driver ships sf0.001/0.01/0.1 only and /root/testdata is
read-only, so sf1 is DERIVED: K=10 copies of every fact table with
all key domains offset per copy (copy i adds i·ceil(domain) to each
key), so joins stay exactly consistent, per-copy skew shape is
preserved, and every foreign key still resolves. nation/region are
fixed-size dims in TPC-H and stay single-copy. The result is for
SCALING-SLOPE EVIDENCE ONLY (BENCH/ROUNDLOG) — certification stays on
the driver's own parquet, per TESTDATA.md.

Usage: python scripts/make_sf1.py [out_dir]   (default /tmp/sf1_synth)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))

# per-table key columns and the DOMAIN each belongs to; every column
# of a domain shifts by the same per-copy offset so joins keep working
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
SINGLE_COPY = ["region", "nation"]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    from pyspark.sql import functions as F

    from yougile_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    # one offset per key DOMAIN: max over every column in the domain,
    # rounded up to a clean power of ten so copy provenance is legible
    domains: dict[str, int] = {}
    frames = {}
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        frames[t] = df
        for col, dom in keys.items():
            m = df.agg(F.max(col)).first()[0]
            domains[dom] = max(domains.get(dom, 0), int(m) + 1)
    for dom, m in list(domains.items()):
        p = 1
        while p < m:
            p *= 10
        domains[dom] = p

    def write_single_file(df, t: str) -> None:
        # ONE file named exactly {t}.parquet: the DuckDB oracle reads
        # '{dir}/{t}.parquet' as a single path and the streaming file
        # source glob-filters on the exact filename — a directory-
        # shaped table would break both. Row groups keep the single
        # file splittable for Spark-side parallelism — but ONLY if
        # there is more than one: the default 128 MB parquet block
        # size wrote sf1 lineitem (113 MB) as a SINGLE row group, so
        # every scan of it ran as one task and the whole sf1 scaling
        # block read core-insensitive (r17 finding — the ≈1 ratios in
        # r16's scaling table were this artifact, not engine
        # serialization). 8 MB row groups ≈ 14 groups for lineitem:
        # small enough to parallelize a 32-core scan, large enough
        # that per-group overhead stays negligible.
        import glob
        import shutil

        tmp = f"{out_dir}/__tmp_{t}"
        df.coalesce(1).write.option("parquet.block.size",
                                    str(8 * 1024 * 1024)) \
            .mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{out_dir}/{t}.parquet")
        shutil.rmtree(tmp)

    for t in SINGLE_COPY:
        write_single_file(spark.read.parquet(f"{SRC}/{t}.parquet"), t)
        print(f"{t}: single copy")

    for t, keys in KEYED.items():
        df = frames[t]
        copies = []
        for i in range(K):
            c = df
            for col, dom in keys.items():
                # Cast to bigint BEFORE the offset (ADVICE r07 #3): a
                # 32-bit key column whose domain rounds up near 2^31
                # would silently WRAP on the high copies, aliasing
                # foreign keys across copies. Keys scale up as int64
                # and stay int64 in the output.
                c = c.withColumn(
                    col,
                    F.col(col).cast("bigint")
                    + F.lit(i * domains[dom]).cast("bigint"))
            copies.append(c)
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        write_single_file(big, t)
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: x{K} -> {n} rows")
    print(f"done: {out_dir} (offsets: {domains})")


if __name__ == "__main__":
    main()
