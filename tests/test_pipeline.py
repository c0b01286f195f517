"""End-to-end pipeline correctness: P/R vs the pandas reference oracle,
plus the invariants the reference's CQL verification blocks check
(SURVEY.md §5.2)."""

from pyspark.sql import functions as F

from kgflow import reference_oracle as ro
from kgflow.plans import pipeline


def _got_triples(spark, transcripts, lexicon):
    terms, isa = lexicon
    triples, nodes = pipeline.run_pipeline(spark, transcripts, terms, isa)
    return triples, nodes


def test_triple_pr_vs_reference_oracle(spark, transcripts, lexicon, lexicon_pdf):
    terms_pdf, isa_pdf = lexicon_pdf
    triples, _ = _got_triples(spark, transcripts, lexicon)
    got = {(r.subj, r.pred, r.obj) for r in triples.collect()}
    exp = ro.expected_triples(transcripts.toPandas(), terms_pdf, isa_pdf)
    p, r = ro.precision_recall(got, exp)
    # both sides deterministic → exact match (target is ≥0.95)
    assert p == 1.0 and r == 1.0, (p, r, len(got), len(exp))


def test_triples_unique(spark, transcripts, lexicon):
    triples, _ = _got_triples(spark, transcripts, lexicon)
    total = triples.count()
    distinct = triples.dropDuplicates(["subj", "pred", "obj"]).count()
    assert total == distinct


def test_no_reciprocal_symmetric_edges(spark, transcripts, lexicon):
    """uniprot_intact.cql:54-58 invariant: zero reciprocal pairs."""
    triples, _ = _got_triples(spark, transcripts, lexicon)
    co = triples.filter(F.col("pred") == "CO_OCCURS_WITH")
    a = co.select("subj", "obj")
    b = co.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"))
    assert a.join(b, ["subj", "obj"]).count() == 0
    # and all pairs are canonically ordered
    assert co.filter(F.col("subj") >= F.col("obj")).count() == 0


def test_obsolete_terms_never_link(spark, transcripts, lexicon):
    """import_go_obo.py:105 — obsolete terms must not receive mentions."""
    terms, _ = lexicon
    triples, _ = _got_triples(spark, transcripts, lexicon)
    obsolete = [r.term_id for r in terms.filter("is_obsolete").collect()]
    hits = triples.filter(F.col("pred") == "MENTIONS").filter(
        F.col("obj").isin(obsolete)
    )
    assert hits.count() == 0


def test_idempotent_rerun(spark, transcripts, lexicon):
    """MERGE semantics: running the import twice yields identical sets."""
    t1, _ = _got_triples(spark, transcripts, lexicon)
    t2, _ = _got_triples(spark, transcripts, lexicon)
    s1 = {tuple(r) for r in t1.collect()}
    s2 = {tuple(r) for r in t2.collect()}
    assert s1 == s2


def test_nodes_cover_all_endpoints(spark, transcripts, lexicon):
    triples, nodes = _got_triples(spark, transcripts, lexicon)
    endpoints = triples.select(F.col("subj").alias("id")).union(
        triples.select("obj")
    ).distinct()
    missing = endpoints.join(nodes, "id", "left_anti").count()
    assert missing == 0
    # node ids unique per (label,id)
    assert nodes.count() == nodes.dropDuplicates(["label", "id"]).count()


def test_per_turn_text_equality_roundtrip(spark, transcripts, tmp_path):
    """input_hint invariant: per-turn text byte-equality under stable
    (conv_id, turn_idx) ordering after a staging round-trip."""
    path = str(tmp_path / "staged")
    (
        transcripts.withColumn("bucket", F.pmod(F.xxhash64("conv_id"), F.lit(8)).cast("int"))
        .repartition("bucket")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    orig = transcripts.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    rt = back.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").collect()
    assert orig == rt


def test_triples_prov_matches_plain(spark, transcripts, lexicon):
    """Provenance aggregate: same (subj,pred,obj) set as build_triples,
    family consistent with predicate, support counts sane, and
    first_seen_run stamped."""
    terms, isa = lexicon
    plain = pipeline.build_triples(transcripts, terms, isa)
    prov = pipeline.build_triples_prov(transcripts, terms, isa, run_id="r1")
    assert prov.count() == plain.count()
    assert (
        prov.select("subj", "pred", "obj")
        .exceptAll(plain.select("subj", "pred", "obj"))
        .count()
        == 0
    )
    rows = prov.collect()
    fam_by_pred = {
        "MENTIONS": "mention",
        "CO_OCCURS_WITH": "cooccur",
        "NEXT_TURN": "next_turn",
    }
    for r in rows:
        assert r.n_obs >= 1
        assert r.first_seen_run == "r1"
        if r.pred in fam_by_pred:
            assert r.family == fam_by_pred[r.pred]
        elif r.pred.startswith("HAS_"):
            assert r.family == "conv_ns"
        if r.family == "ontology":
            assert r.n_convs == 0
        else:
            assert 1 <= r.n_convs <= r.n_obs
    # n_obs totals the pre-dedup union
    raw = pipeline._assemble_triples(
        transcripts, isa, pipeline.prepare_lexicon(terms)
    ).count()
    assert sum(r.n_obs for r in rows) == raw


def test_lexicon_size_guard_routes_to_broadcast_join(spark, transcripts, lexicon):
    """A lexicon whose surface count exceeds max_fused_surfaces must not
    build driver-side dicts: prepare_lexicon leaves surface_map/canon_map
    None, which routes _assemble_triples to the link.link_mentions
    broadcast-join composition — and the triples are identical."""
    terms, isa = lexicon
    lex_fused = pipeline.prepare_lexicon(terms)
    assert lex_fused.surface_map is not None  # small lexicon: fused path
    lex_comp = pipeline.prepare_lexicon(terms, max_fused_surfaces=0)
    assert lex_comp.surface_map is None and lex_comp.canon_map is None
    fused = {
        tuple(r)
        for r in pipeline.build_triples(transcripts, terms, isa, lex=lex_fused).collect()
    }
    comp = {
        tuple(r)
        for r in pipeline.build_triples(transcripts, terms, isa, lex=lex_comp).collect()
    }
    assert fused == comp
