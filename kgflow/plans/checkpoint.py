"""Per-partition lineage ledger + resumable incremental runs.

Replaces the reference's work-queue resume idioms — ``WHERE p.title IS
NULL LIMIT batch`` polling (``neo4j_pubmed_batch_embeddings_processor.py:
495-506``) and ``needs_properties`` placeholder flags
(``neo4j_cancerkg_builder.py:124-139``) — with an explicit bucket-level
ledger:

* input transcripts carry ``bucket = pmod(xxhash64(conv_id), P)``;
* each bucket's content fingerprint = xor-agg of per-row hashes (order
  independent, computed map-side, one tiny shuffle);
* a completed bucket writes one ledger row with lineage counts
  (rows_in, mentions_out, triples_out) and the fingerprint;
* on restart, buckets whose fingerprint matches a ``done`` ledger row
  are skipped (anti-join); output parquet is partitioned by bucket with
  dynamic partition overwrite, so re-processing a bucket is idempotent.

At 100 TB the ledger is thousands of rows — driver-negligible — while
the skipped work is the entire completed input.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def auto_bucket_count(
    transcripts: DataFrame, target_rows_per_bucket: int = 200_000
) -> int:
    """Deterministic bucket count from input size: the next power of two
    that keeps buckets near ``target_rows_per_bucket`` rows, clamped to
    [8, 4096]. Power-of-two keeps counts stable under small input drift
    (a 5% growth must NOT change the count — resume depends on it)."""
    import math

    n = transcripts.count()
    raw = max(1.0, n / target_rows_per_bucket)
    return max(8, min(4096, 2 ** math.ceil(math.log2(raw))))


def with_bucket(transcripts: DataFrame, buckets: int) -> DataFrame:
    if "bucket" in transcripts.columns:
        return transcripts
    return transcripts.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(buckets)).cast("int")
    )


def bucket_fingerprints(transcripts: DataFrame) -> DataFrame:
    """(bucket, input_fingerprint, rows_in) — order-insensitive content hash.

    ``rows_in`` is part of the resume match key, not just lineage: the
    xor-agg cancels on even multiplicities (adding two copies of an
    existing row leaves the xor unchanged), and the row count catches
    every pure-duplication collision for free.
    """
    row_hash = F.xxhash64("conv_id", "turn_idx", F.coalesce("text", F.lit("")))
    return transcripts.groupBy("bucket").agg(
        # xor-agg: order-insensitive, overflow-free under ANSI mode
        F.bit_xor(row_hash).alias("_h"),
        F.count(F.lit(1)).alias("rows_in"),
    ).select(
        "bucket", F.hex(F.col("_h")).alias("input_fingerprint"), "rows_in"
    )


def bucket_quality(transcripts: DataFrame) -> DataFrame:
    """(bucket, avg_tokens, avg_ttr_q4, empty_turns) — per-bucket
    data-quality aggregates recorded in the ledger beside the lineage
    counts, so a resumable run emits quality lineage per partition (the
    batch form of the lexical-diversity / quality-score queries).

    Scaled-integer TTR (×10⁴) keeps the aggregate exact across partition
    orders; one map-side-combining aggregate over only the pending
    buckets — negligible next to extraction.
    """
    from ..functions import text as tx

    t = F.coalesce(F.col("text"), F.lit(""))
    toks = tx.tokens(t)
    n_tok = F.size(toks)
    ttr_q4 = F.when(
        n_tok > 0, F.round(F.size(F.array_distinct(toks)) * 10000 / n_tok, 0)
    )
    return transcripts.groupBy("bucket").agg(
        F.round(F.avg(n_tok), 2).alias("avg_tokens"),
        F.round(F.avg(ttr_q4), 0).cast("long").alias("avg_ttr_q4"),
        F.sum(F.when(F.trim(t) == "", 1).otherwise(0)).cast("long").alias("empty_turns"),
    )


def table_fingerprint(df: DataFrame) -> str:
    """Order-insensitive whole-table content hash (hex string) — used to
    version the lexicon/ontology inputs inside the ledger match key, so
    a changed term table invalidates every bucket's resume row."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in sorted(df.columns)]
    row = (
        df.select(F.xxhash64(*cols).alias("_h"))
        .agg(F.bit_xor("_h").alias("_x"), F.count(F.lit(1)).alias("_n"))
        .first()
    )
    return f"{(row['_x'] or 0) & 0xFFFFFFFFFFFFFFFF:016X}-{row['_n']}"


@dataclass
class ResumeReport:
    run_id: str
    total_buckets: int
    skipped_buckets: int
    processed_buckets: int
    triples_out: int


def _ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_ledger")


def read_ledger(spark: SparkSession, out_dir: str) -> DataFrame | None:
    p = _ledger_path(out_dir)
    if not os.path.exists(p):
        return None
    return spark.read.json(p)


def run_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    terms: DataFrame,
    isa_edges: DataFrame,
    out_dir: str,
    buckets: int | None = 32,
    fail_after_buckets: int | None = None,
) -> ResumeReport:
    """Extract triples bucket-by-bucket group with ledger skip/resume.

    ``buckets=None`` derives the count from the input size
    (``auto_bucket_count``) — but ONLY on a fresh run. Once a ledger
    exists, its recorded count is authoritative: the on-disk partition
    layout and every fingerprint row were computed under it, so a
    resumed auto run MUST reuse it even if the input has since grown
    past the auto threshold (a changed count would re-bucket every
    conversation — nothing would line up). Changing the count requires
    an explicit ``buckets=`` (which re-runs everything, since no
    fingerprint computed under a different count can match).

    ``fail_after_buckets`` simulates a mid-run crash for the
    resume-equals-fresh test: only the first k pending buckets are
    processed and the ledger records exactly those.
    """
    from . import pipeline as P

    t_start = time.time()
    run_id = f"run-{int(t_start * 1000)}"
    ledger = read_ledger(spark, out_dir)
    if buckets is None:
        recorded = None
        if ledger is not None and "buckets" in ledger.columns:
            latest_row = (
                ledger.filter(F.col("buckets").isNotNull())
                .orderBy(F.desc("ts"), F.desc("run_id"))
                .select("buckets")
                .first()
            )
            recorded = int(latest_row["buckets"]) if latest_row else None
        if recorded is None and ledger is not None:
            # a ledger exists but records no bucket count (written by a
            # pre-recording version): the auto count chosen now may
            # differ from the one the on-disk layout was built under, in
            # which case every fingerprint mismatches and the whole
            # corpus re-runs. Say so — a silent full re-run reads as a
            # resume bug, not a versioning consequence.
            import sys
            import warnings

            auto = auto_bucket_count(transcripts)
            msg = (
                f"run_resumable(buckets=None): the ledger at {out_dir} "
                "records no bucket count (pre-versioning ledger); using "
                f"auto_bucket_count={auto}. If the existing layout was "
                "built under a different count, no fingerprint will match "
                "and ALL buckets will re-run. Pass buckets=<original "
                "count> explicitly to resume the old layout."
            )
            warnings.warn(msg, stacklevel=2)
            print(f"WARNING: {msg}", file=sys.stderr)
            buckets = auto
        else:
            buckets = recorded if recorded is not None else auto_bucket_count(transcripts)
    tr = with_bucket(transcripts, buckets)
    fps = bucket_fingerprints(tr)
    # terms/isa_edges are inputs to every bucket's triples (linking,
    # HAS_NS, canonical mapping) — fold their content hash into the
    # resume match key so a changed lexicon re-runs every bucket instead
    # of silently serving stale fingerprint-matching output.
    lex_fp = table_fingerprint(terms) + "|" + table_fingerprint(isa_edges)
    if ledger is not None and "lex_fingerprint" in ledger.columns:
        from ..operators.canon import dedup_keep_first

        # only a bucket's LATEST ledger row reflects what is on disk —
        # an older fingerprint may match re-reverted input while the
        # partition still holds a different run's output. Latest is
        # taken over ALL statuses (a 'pruned' tombstone must shadow the
        # 'done' row underneath it), THEN filtered to done.
        latest = dedup_keep_first(
            ledger,
            ["partition_id"],
            [F.desc("ts"), F.desc("run_id")],
        ).filter(F.col("status") == "done")
        done = latest.filter(F.col("lex_fingerprint") == lex_fp).select(
            F.col("partition_id").alias("bucket"), "input_fingerprint", "rows_in"
        )
        pending = fps.join(done, ["bucket", "input_fingerprint", "rows_in"], "left_anti")
    else:
        # no ledger, or a pre-lex_fingerprint ledger (can't prove the
        # lexicon matched) — everything is pending
        pending = fps

    pending_list = sorted(r.bucket for r in pending.select("bucket").collect())
    total = fps.count()

    # A bucket whose input rows disappeared entirely produces no fps row
    # and is never pending — its on-disk partition must be cleared here
    # or read_triples keeps serving it (runs before the early return so
    # a shrink-only change is still applied).
    import shutil

    triples_dir = os.path.join(out_dir, "triples")
    if os.path.isdir(triples_dir):
        valid = {int(r.bucket) for r in fps.select("bucket").collect()} | {-1}
        pruned: list[int] = []
        for d in os.listdir(triples_dir):
            if d.startswith("bucket="):
                try:
                    bv = int(d.split("=", 1)[1])
                except ValueError:
                    continue
                if bv not in valid:
                    shutil.rmtree(os.path.join(triples_dir, d), ignore_errors=True)
                    pruned.append(bv)
        if pruned:
            # tombstone the pruned buckets: without it, the bucket's old
            # 'done' row stays latest, and a byte-identical reappearance
            # of its input would be skipped while the partition dir no
            # longer exists (silently serving zero triples).
            os.makedirs(_ledger_path(out_dir), exist_ok=True)
            t_now = time.time()
            with open(
                os.path.join(_ledger_path(out_dir), f"{run_id}-prune.json"), "w"
            ) as fh:
                for bv in pruned:
                    fh.write(
                        json.dumps(
                            {
                                "run_id": run_id,
                                "partition_id": int(bv),
                                "input_fingerprint": "",
                                "lex_fingerprint": lex_fp,
                                "rows_in": 0,
                                "triples_out": 0,
                                "buckets": int(buckets),
                                "status": "pruned",
                                "ts": t_now,
                            }
                        )
                        + "\n"
                    )
    if fail_after_buckets is not None:
        pending_list = pending_list[:fail_after_buckets]
    if not pending_list:
        return ResumeReport(run_id, total, total, 0, 0)

    todo = tr.filter(F.col("bucket").isin(pending_list))
    quality = {
        r["bucket"]: (r["avg_tokens"], r["avg_ttr_q4"], r["empty_turns"])
        for r in bucket_quality(todo).collect()
    }
    triples = P.build_triples(todo.drop("bucket"), terms, isa_edges, with_src=True)

    # bucket = the source conversation's bucket (same function as the
    # input bucketing), so a bucket's triples are a pure function of that
    # bucket's transcripts; ontology triples (no src_conv) go to -1 and
    # are recomputed idempotently on every run.
    triples_b = triples.withColumn(
        "bucket",
        F.when(
            F.col("src_conv").isNotNull(),
            F.pmod(F.xxhash64("src_conv"), F.lit(buckets)).cast("int"),
        ).otherwise(F.lit(-1)),
    ).drop("src_conv")
    # dynamic partition overwrite: only touched buckets are rewritten,
    # so a re-run of the same bucket is idempotent. A pending bucket
    # whose new input yields ZERO triples writes no partition, which
    # would leave its previous output stale — clear those explicitly
    # (the parquet analogue of Iceberg's replaceWhere). The session conf
    # is restored afterwards so unrelated writes keep their semantics.
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        triples_b = triples_b.localCheckpoint(eager=True)
        written = {r.bucket for r in triples_b.select("bucket").distinct().collect()}
        (
            triples_b.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(triples_dir)
        )
    finally:
        if prev_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    for b in pending_list:
        if b not in written:
            shutil.rmtree(os.path.join(triples_dir, f"bucket={b}"), ignore_errors=True)

    out = spark.read.parquet(os.path.join(out_dir, "triples")).filter(
        F.col("bucket").isin(pending_list + [-1])
    )
    stats = {r["bucket"]: r["n"] for r in out.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    fp_map = {r.bucket: (r.input_fingerprint, r.rows_in) for r in fps.collect()}

    os.makedirs(_ledger_path(out_dir), exist_ok=True)
    rows = []
    now = time.time()
    for b in pending_list:
        fp, rows_in = fp_map.get(b, ("", 0))
        avg_tok, ttr_q4, n_empty = quality.get(b, (None, None, None))
        rows.append(
            {
                "run_id": run_id,
                "partition_id": int(b),
                "input_fingerprint": fp,
                "lex_fingerprint": lex_fp,
                "rows_in": int(rows_in),
                "triples_out": int(stats.get(b, 0)),
                # data-quality lineage (per-bucket aggregates, see
                # bucket_quality): resumable runs audit WHAT they
                # processed, not just how much
                "avg_tokens": float(avg_tok) if avg_tok is not None else None,
                "avg_ttr_q4": int(ttr_q4) if ttr_q4 is not None else None,
                "empty_turns": int(n_empty) if n_empty is not None else None,
                # the bucket count this run partitioned under — the
                # resume-time authority for buckets=None auto runs
                "buckets": int(buckets),
                "status": "done",
                "ts": now,
            }
        )
    fname = os.path.join(_ledger_path(out_dir), f"{run_id}.json")
    with open(fname, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    report = ResumeReport(
        run_id,
        total,
        total - len(pending_list),
        len(pending_list),
        sum(stats.values()),
    )
    # run-level metrics artifact (throughput + counts) next to the ledger
    from .metrics import RunMetrics

    m = RunMetrics(run_id=run_id)
    m.started_at = t_start
    m.rows_in = sum(r["rows_in"] for r in rows)
    m.triples = report.triples_out
    m.finish().write(out_dir)
    return report


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    """Global triple-set view: bucket-local rows deduped on read (the
    same triple may be derived from several conversations)."""
    return (
        spark.read.parquet(os.path.join(out_dir, "triples"))
        .select("subj", "pred", "obj")
        .dropDuplicates(["subj", "pred", "obj"])
    )
