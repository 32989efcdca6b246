#!/usr/bin/env python
"""Two-parallelism scaling evidence for the north rule.

Runs the SAME index-build job on the SAME input at local[N] and
local[4N] (separate JVMs) and reports throughput at both plus scaling
efficiency = T(4N) / (4 x T(N)) ... measured as
  eff = (docs_per_sec at 4N) / (4 x docs_per_sec at N)
Writes BENCH/BASELINE.md. The sandbox has no multi-node cluster; two
local parallelism levels on identical input are the driver-sanctioned
proxy for the N -> 4N executor scaling criterion.

Usage: python scripts/scaling_run.py [n_low] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from google_like_search_engine_spark.session import get_spark
from google_like_search_engine_spark.indexer import build_postings, build_posting_lists

cores = int(sys.argv[1]); sf_dir = sys.argv[2]
spark = get_spark("scaling", cores=cores, shuffle_partitions=cores)
docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("doc_id"),
                F.col("doc_id").cast("string").alias("url"), "text")
        .repartition(cores * 2).cache())
n = docs.count()  # materialize input once so the timed run is compute-only
t0 = time.perf_counter()
(build_posting_lists(build_postings(docs), salt_buckets=8)
 .write.mode("overwrite").parquet(f"/tmp/scaling_postings_{cores}"))
dt = time.perf_counter() - t0
print(json.dumps({"cores": cores, "n_docs": n, "sec": dt,
                  "docs_per_sec": n / dt}))
spark.stop()
"""


def run_at(cores: int, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, str(cores), sf_dir],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    lo = run_at(n_low, sf_dir)
    hi = run_at(n_low * 4, sf_dir)
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    report = {
        "low": lo, "high": hi, "scaling_efficiency": round(eff, 3),
        "sf_dir": sf_dir, "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — measured numbers

## Scaling evidence (north-rule two-cluster-size criterion, sandbox proxy)

Same inverted-index build job, same input ({sf_dir}/documents.parquet,
{lo['n_docs']} docs), two parallelism levels in separate JVMs:

| parallelism | wall-clock (s) | throughput (docs/sec) |
|---|---|---|
| local[{lo['cores']}] | {lo['sec']:.2f} | {lo['docs_per_sec']:.1f} |
| local[{hi['cores']}] | {hi['sec']:.2f} | {hi['docs_per_sec']:.1f} |

**Scaling efficiency local[{lo['cores']}] -> local[{hi['cores']}]:
{eff:.3f}** (target >= 0.8 from N to 4N; measured
{hi['docs_per_sec']:.1f} / (4 x {lo['docs_per_sec']:.1f})).

Notes: single-machine local mode shares one JVM, page cache, and
shuffle disk, so this is a *lower bound* on multi-node scaling for this
embarrassingly-parallel build (scan -> Arrow-batch tokenize -> salted
term-sharded aggregation); the only cross-task structure is the final
term shuffle, which is salted to {8} buckets per term to cap reducer
skew. Regenerate: `python scripts/scaling_run.py {n_low} {sf_dir}`.

## Reference baseline

The reference repo publishes no benchmark numbers (BASELINE.md at repo
root); these measurements define the baseline going forward.
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
