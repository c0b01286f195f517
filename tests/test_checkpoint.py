"""Resumable checkpointing: resume-equals-fresh, skip-completed, upsert."""

from pyspark.sql import functions as F

from kgflow.plans import checkpoint as cp
from kgflow.plans import materialize as mat


def _triple_set(spark, out_dir):
    return {tuple(r) for r in cp.read_triples(spark, out_dir).collect()}


def test_resume_equals_fresh(spark, transcripts, lexicon, tmp_path):
    """Kill after k buckets → resume → identical to a fresh full run."""
    terms, isa = lexicon
    fresh_dir = str(tmp_path / "fresh")
    rep = cp.run_resumable(spark, transcripts, terms, isa, fresh_dir, buckets=8)
    assert rep.processed_buckets == rep.total_buckets
    fresh = _triple_set(spark, fresh_dir)
    assert fresh

    crash_dir = str(tmp_path / "crash")
    rep1 = cp.run_resumable(
        spark, transcripts, terms, isa, crash_dir, buckets=8, fail_after_buckets=3
    )
    assert rep1.processed_buckets == 3
    rep2 = cp.run_resumable(spark, transcripts, terms, isa, crash_dir, buckets=8)
    assert rep2.skipped_buckets == 3
    assert rep2.processed_buckets == rep2.total_buckets - 3
    assert _triple_set(spark, crash_dir) == fresh


def test_completed_run_skips_everything(spark, transcripts, lexicon, tmp_path):
    terms, isa = lexicon
    d = str(tmp_path / "done")
    cp.run_resumable(spark, transcripts, terms, isa, d, buckets=8)
    rep = cp.run_resumable(spark, transcripts, terms, isa, d, buckets=8)
    assert rep.processed_buckets == 0
    assert rep.skipped_buckets == rep.total_buckets


def test_changed_bucket_reprocessed(spark, transcripts, lexicon, tmp_path):
    """Fingerprint mismatch → only the changed bucket re-runs."""
    terms, isa = lexicon
    d = str(tmp_path / "chg")
    cp.run_resumable(spark, transcripts, terms, isa, d, buckets=8)
    # mutate one conversation's text → its bucket's fingerprint changes
    mutated = transcripts.withColumn(
        "text",
        F.when(F.col("conv_id") == "conv-000000", F.concat(F.col("text"), F.lit(" zzz")))
        .otherwise(F.col("text")),
    )
    rep = cp.run_resumable(spark, mutated, terms, isa, d, buckets=8)
    assert rep.processed_buckets == 1


def test_ledger_lineage_counts(spark, transcripts, lexicon, tmp_path):
    terms, isa = lexicon
    d = str(tmp_path / "lin")
    cp.run_resumable(spark, transcripts, terms, isa, d, buckets=8)
    ledger = cp.read_ledger(spark, d)
    assert ledger is not None
    rows = ledger.collect()
    assert all(r.status == "done" for r in rows)
    assert sum(r.rows_in for r in rows) == transcripts.count()
    assert all(r.input_fingerprint for r in rows)


def test_materialize_upsert(spark, tmp_path):
    """MERGE semantics on the parquet fallback sink."""
    path = str(tmp_path / "nodes")
    b1 = spark.createDataFrame([("a", "v1"), ("b", "v1")], "id string, val string")
    mat.upsert(b1, path, ["id"])
    b2 = spark.createDataFrame([("b", "v2"), ("c", "v2")], "id string, val string")
    mat.upsert(b2, path, ["id"])
    got = {
        (r.id, r.val) for r in mat.read_table(spark, path).select("id", "val").collect()
    }
    assert got == {("a", "v1"), ("b", "v2"), ("c", "v2")}
    # idempotent re-apply
    mat.upsert(b2, path, ["id"])
    got2 = {
        (r.id, r.val) for r in mat.read_table(spark, path).select("id", "val").collect()
    }
    assert got2 == got


def test_run_metrics_written(spark, transcripts, lexicon, tmp_path):
    import glob
    import json as _json

    terms, isa = lexicon
    d = str(tmp_path / "metrics")
    rep = cp.run_resumable(spark, transcripts, terms, isa, d, buckets=4)
    files = glob.glob(d + "/_metrics/*.json")
    assert len(files) == 1
    m = _json.loads(open(files[0]).read())
    assert m["run_id"] == rep.run_id
    assert m["rows_in"] == transcripts.count()
    assert m["triples"] == rep.triples_out > 0
    assert m["wall_sec"] > 0 and m["triples_per_sec"] > 0


def test_zero_output_bucket_clears_stale_triples(spark, transcripts, lexicon, tmp_path):
    """A re-processed bucket whose new input yields no triples must not
    leave the previous run's triples on disk."""
    terms, isa = lexicon
    d = str(tmp_path / "stale")
    cp.run_resumable(spark, transcripts, terms, isa, d, buckets=8)

    # find the bucket of one conversation and gut it: single turn, no
    # mentionable text -> that bucket produces zero triples
    conv = "conv-000000"
    b = cp.with_bucket(transcripts, 8).filter(F.col("conv_id") == conv).select("bucket").first().bucket
    bucket_convs = [
        r.conv_id
        for r in cp.with_bucket(transcripts, 8)
        .filter(F.col("bucket") == b)
        .select("conv_id")
        .distinct()
        .collect()
    ]
    keep = transcripts.filter(~F.col("conv_id").isin(bucket_convs))
    gutted = spark.createDataFrame(
        [(c, 0, "user", "zzz", None, None) for c in bucket_convs],
        transcripts.schema,
    )
    mutated = keep.unionByName(gutted)

    rep = cp.run_resumable(spark, mutated, terms, isa, d, buckets=8)
    assert rep.processed_buckets == 1
    got = {tuple(r) for r in cp.read_triples(spark, d).collect()}
    fresh_dir = str(tmp_path / "stale_fresh")
    cp.run_resumable(spark, mutated, terms, isa, fresh_dir, buckets=8)
    fresh = {tuple(r) for r in cp.read_triples(spark, fresh_dir).collect()}
    assert got == fresh  # no stale triples from the gutted bucket
