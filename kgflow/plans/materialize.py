"""Idempotent node/edge table materialization.

The reference relies on Neo4j ``MERGE`` for upsert-by-business-key
(``import_cosmic_mutant_census.cql:30-33`` ON CREATE vs ON MATCH) and on
destructive reloads (``import_hgnc.cql:6-10`` DETACH DELETE). Here the
sink is an abstract *upsert into a keyed table*:

* on Iceberg-enabled clusters this is ``MERGE INTO`` (one atomic
  commit, snapshot isolation);
* the portable fallback (used in this sandbox, plain parquet) is
  union + window-dedup keep-latest, written to a new snapshot directory
  and atomically pointed to — never read-and-overwrite in place.

Both paths have the same observable semantics: at most one row per key,
latest batch wins, re-running the same batch is a no-op.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_POINTER = "_LATEST"


def _latest_dir(path: str) -> str | None:
    p = os.path.join(path, _POINTER)
    if os.path.exists(p):
        with open(p) as fh:
            snap = json.load(fh)["snapshot"]
        return os.path.join(path, snap)
    return None


def read_table(spark: SparkSession, path: str) -> DataFrame | None:
    d = _latest_dir(path)
    if d is None:
        return None
    return spark.read.parquet(d)


def upsert(
    df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str = "_batch_seq",
) -> None:
    """MERGE-semantics upsert: one row per key, highest ``order_col`` wins;
    ties broken deterministically by the remaining columns' hash (no
    first-writer-wins nondeterminism — SURVEY.md §7.5.2)."""
    spark = df.sparkSession
    existing = read_table(spark, path)
    seq = int(time.time() * 1000)
    batch = df
    if order_col not in batch.columns:
        batch = batch.withColumn(order_col, F.lit(seq))
    if existing is not None:
        if order_col not in existing.columns:
            existing = existing.withColumn(order_col, F.lit(0))
        batch = existing.unionByName(batch, allowMissingColumns=True)
    value_cols = [c for c in batch.columns if c not in keys and c != order_col]
    content_tiebreak = (
        F.xxhash64(*[F.col(c).cast("string") for c in value_cols])
        if value_cols
        else F.lit(0)  # key-only table: rows are identical beyond the key
    )
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), content_tiebreak)
    merged = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    write_snapshot(merged, path)


def write_snapshot(df: DataFrame, path: str) -> str:
    """Write a new immutable snapshot dir and flip the pointer (the
    parquet stand-in for an Iceberg snapshot commit)."""
    os.makedirs(path, exist_ok=True)
    snap = f"snap-{int(time.time() * 1000)}-{os.getpid()}"
    out = os.path.join(path, snap)
    df.write.mode("overwrite").parquet(out)
    tmp = os.path.join(path, _POINTER + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"snapshot": snap, "ts": time.time()}, fh)
    os.replace(tmp, os.path.join(path, _POINTER))
    # retain only the two most recent snapshots (cheap time travel)
    snaps = sorted(d for d in os.listdir(path) if d.startswith("snap-"))
    for old in snaps[:-2]:
        shutil.rmtree(os.path.join(path, old), ignore_errors=True)
    return out
