"""Entity-scale connected-components benchmark (ROADMAP #6).

Deterministic same-as graph generated DISTRIBUTED (no driver lists):
chains (deep diameter — stresses pointer doubling), hubs (Zipf-style
50k+-degree supernodes — stresses the min() aggregate), and pseudo-
random cross-links (collapse everything toward one giant component —
worst case for min-label propagation).

Usage:
    python3 tools/cc_bench.py [edges] [cores ...]
    # default: 10_000_000 edges at local[16] and local[4]

Prints one JSON line per level and appends nothing; paste results into
PERF.md. Reference analogue: the alt_id same-as graphs the importers
resolve one MERGE at a time (import_go_obo.py:125-143) — here the
whole graph is one iterative DataFrame computation.
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from kgflow.session import get_spark
from kgflow.operators import canon

n_edges = int(sys.argv[1]); cores = int(sys.argv[2])
spark = get_spark("cc-bench", master="local[%%d]" %% cores,
                  shuffle_partitions=max(cores * 4, 32))
spark.sparkContext.setLogLevel("ERROR")

chain_len = 64                      # diameter driver
n_hubs = 10
n_chain = int(n_edges * 0.70)
n_hub = int(n_edges * 0.25)
n_cross = n_edges - n_chain - n_hub
n_chains = n_chain // (chain_len - 1)

chains = spark.range(n_chain).select(
    F.concat(F.lit("c"), (F.col("id") / (chain_len - 1)).cast("long"),
             F.lit("_"), F.col("id") %% (chain_len - 1)).alias("id_a"),
    F.concat(F.lit("c"), (F.col("id") / (chain_len - 1)).cast("long"),
             F.lit("_"), F.col("id") %% (chain_len - 1) + 1).alias("id_b"),
)
hubs = spark.range(n_hub).select(
    F.concat(F.lit("h"), F.col("id") %% n_hubs).alias("id_a"),
    F.concat(F.lit("hl"), F.col("id")).alias("id_b"),
)
cross = spark.range(n_cross).select(
    F.concat(F.lit("c"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_chains)),
             F.lit("_"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(chain_len - 1))
             ).alias("id_a"),
    F.concat(F.lit("hl"), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_hub))
             ).alias("id_b"),
)
edges = chains.unionByName(hubs).unionByName(cross) \
    .repartition(max(cores * 4, 32)).localCheckpoint(eager=True)
n = edges.count()

t0 = time.time()
cc = canon.connected_components(edges, max_iter=40)
comp = cc.groupBy("canonical_id").count()
n_comp, biggest, n_nodes = (
    comp.agg(F.count(F.lit(1)), F.max("count"), F.sum("count")).first()
)
dt = time.time() - t0
print(json.dumps({"edges": n, "cores": cores, "sec": round(dt, 1),
                  "nodes": int(n_nodes), "components": int(n_comp),
                  "giant": int(biggest)}))
spark.stop()
"""


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    levels = [int(c) for c in sys.argv[2:]] or [16, 4]
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = "/root/.pyenv/shims/python3"
    for cores in levels:
        out = subprocess.run(
            ["/root/.pyenv/shims/python3", "-c", _CHILD % {"repo": REPO},
             str(n_edges), str(cores)],
            capture_output=True, text=True, env=env,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit(f"level cores={cores} failed")
        print(lines[-1])


if __name__ == "__main__":
    main()
