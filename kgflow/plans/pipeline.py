"""End-to-end KG-construction DAG.

transcripts → mentions → linked mentions → (subj, pred, obj) triples →
canonicalization → deduped triples + node table.

Emitted triple families (the P/R comparison contract, mirrored
byte-for-byte by ``kgflow.reference_oracle``):

=================  ==========================================  ==========================================
predicate          subj → obj                                  reference analogue
=================  ==========================================  ==========================================
``MENTIONS``       ``turn:<conv>:<idx>`` → term                PubMedArticle→MeshTerm ``HAS_MESH_TERM``
                                                               (``PubMedAbstractEmbedding.py:205-210``)
``HAS_<NS>``       ``conv:<conv>`` → term (NS=upper namespace) gene→GOTerm ``HAS_<upper(go ns)>``
                                                               (``cql/import/uniprot/uniprot_relationships.cql:11-37``)
``CO_OCCURS_WITH`` term ↔ term, least/greatest canonical       ``INTERACTS_WITH`` symmetric dedup
                                                               (``cql/import/uniprot/uniprot_intact.cql:30-39``)
``NEXT_TURN``      turn → following turn in conversation       stable (conv_id, turn_idx) ordering
                                                               invariant (BASELINE.json input_hint)
``IS_A``/dynamic   term → term, upper-cased, ``:``/space→``_`` OBO hierarchy (``import_go_obo.py:125-143,
                                                               248-258``; ``import_squence_ontology_obo.py:98``)
=================  ==========================================  ==========================================

All term endpoints are rewritten through the connected-components
canonical mapping derived from alt_id same-as links before the final
global dedup (MERGE-idempotence, C2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import canon, extract, link


@dataclass
class Lexicon:
    """Prepared lexicon artifacts: built once per lexicon version, reused
    across every batch/stream run (dimension prep is not per-batch work —
    the reference likewise parses ontologies once up front,
    import_go_obo.py:64-145). ``surface_map``/``canon_map`` are the
    driver-side dict forms of ``dim``/``mapping`` (dimension-scale),
    broadcast into the fused extraction stage."""

    surfaces: list[str]
    dim: DataFrame  # (surface, term_id, namespace), cached
    mapping: DataFrame  # (id, canonical_id), cached
    surface_map: dict[str, tuple[str, str]] | None = None
    canon_map: dict[str, str] | None = None


def prepare_lexicon(
    terms: DataFrame, max_fused_surfaces: int = 2_000_000
) -> Lexicon:
    """Build the per-lexicon artifacts once.

    ``max_fused_surfaces`` guards the driver: the fused extraction path
    materializes the full (surface → term, id → canonical) dicts on the
    driver and pickle-broadcasts them, which is right at ontology scale
    (the reference parses whole ontologies driver-side,
    import_go_obo.py:64-145) but would build multi-GB Python dicts for a
    10M-surface lexicon. Above the threshold only the surface LIST (the
    matcher's irreducible broadcast artifact) is collected and
    ``surface_map``/``canon_map`` stay None, which routes
    ``_assemble_triples`` to the broadcast-JOIN composition form
    (link.link_mentions + canon.apply_canonical) — same triples, JVM-side
    Tungsten-compact broadcast instead of Python dicts.
    """
    dim = link.surface_dim(terms).cache()
    n_surfaces = dim.count()
    mapping = canon.connected_components(link.alt_id_edges(terms)).cache()
    if n_surfaces > max_fused_surfaces:
        import logging

        logging.getLogger("kgflow").warning(
            "lexicon has %d surfaces (> %d): fused driver-dict path disabled, "
            "using broadcast-join linking",
            n_surfaces,
            max_fused_surfaces,
        )
        surfaces = [r.surface for r in dim.select("surface").collect()]
        return Lexicon(surfaces=surfaces, dim=dim, mapping=mapping)
    dim_rows = dim.collect()
    surfaces = [r.surface for r in dim_rows]
    return Lexicon(
        surfaces=surfaces,
        dim=dim,
        mapping=mapping,
        surface_map={r.surface: (r.term_id, r.namespace) for r in dim_rows},
        canon_map={r.id: r.canonical_id for r in mapping.collect()},
    )


def normalize_predicate(col):
    """upper-case + ``:``/space → ``_`` (import_go_obo.py:256,
    import_squence_ontology_obo.py:98)."""
    return F.upper(F.regexp_replace(F.trim(col), "[: ]", "_"))


def lexicon_surfaces(terms: DataFrame) -> list[str]:
    """Collect the (small, dimension-scale) surface list for broadcast."""
    rows = (
        terms.filter(~F.coalesce("is_obsolete", F.lit(False)))
        .select(
            F.explode(
                F.array_union(F.array("name"), F.coalesce("synonyms", F.array()))
            ).alias("s")
        )
        .select(F.lower(F.trim("s")).alias("s"))
        .filter(F.col("s") != "")
        .distinct()
        .collect()
    )
    return [r.s for r in rows]


def _assemble_triples(
    transcripts: DataFrame,
    isa_edges: DataFrame,
    lex: Lexicon,
) -> DataFrame:
    """Pre-dedup triple union: (subj, pred, obj, src_conv, family).

    ``family`` tags which extraction rule produced the row (mention /
    conv_ns / cooccur / next_turn / ontology) — the provenance unit the
    reference tracks per import script (each CQL import file is one
    family; cql/import/*). ``src_conv`` is the source conversation
    (null for ontology rows).
    """
    mapping = lex.mapping

    if lex.surface_map is not None:
        # fused path: linking + canonical rewrite ride the extraction
        # batch loop, GROUPED per turn (extract.extract_linked_terms_
        # grouped) — no second pass over the mention table, the
        # checkpoint holds one compact array row per turn, and the
        # per-turn term sets for co-occurrence come straight off the
        # arrays (no groupBy shuffle — see per_turn_sets below).
        grouped = extract.extract_linked_terms_grouped(
            transcripts, lex.surface_map, lex.canon_map
        ).localCheckpoint(eager=True)
        # exploding the zipped arrays reproduces extract_linked_mentions
        # exactly (multiplicity preserved → n_obs provenance unchanged);
        # the explode is narrow JVM work, no exchange
        linked = grouped.select(
            "conv_id",
            "turn_idx",
            F.explode(F.arrays_zip("term_ids", "namespaces")).alias("_m"),
        ).select(
            "conv_id",
            "turn_idx",
            F.col("_m.term_ids").alias("term_id"),
            F.col("_m.namespaces").alias("namespace"),
        )
        per_turn_sets = grouped.select(
            "conv_id",
            "turn_idx",
            F.array_sort(F.array_distinct("term_ids")).alias("ts"),
        )
    else:
        # operator-composition form (kept for Lexicons built without
        # driver-side maps): broadcast-join linking + canonical rewrite
        mentions = extract.extract_mentions(transcripts, lex.surfaces)
        linked = link.link_mentions(mentions, lex.dim)
        linked = canon.apply_canonical(linked, mapping, ["term_id"]).localCheckpoint(
            eager=True
        )
        # one shuffle to assemble per-turn term sets (the fused path
        # gets these for free from the grouped extraction)
        per_turn_sets = linked.groupBy("conv_id", "turn_idx").agg(
            F.sort_array(F.collect_set("term_id")).alias("ts")
        )

    turn_uri = F.concat(F.lit("turn:"), "conv_id", F.lit(":"), F.col("turn_idx"))
    conv_uri = F.concat(F.lit("conv:"), "conv_id")
    src = F.col("conv_id").alias("src_conv")

    mentions_triples = linked.select(
        turn_uri.alias("subj"),
        F.lit("MENTIONS").alias("pred"),
        F.col("term_id").alias("obj"),
        src,
        F.lit("mention").alias("family"),
    )

    has_ns_triples = linked.select(
        conv_uri.alias("subj"),
        F.concat(F.lit("HAS_"), F.upper("namespace")).alias("pred"),
        F.col("term_id").alias("obj"),
        src,
        F.lit("conv_ns").alias("family"),
    )

    # within-turn co-occurrence. NOT a self-join: per-turn distinct term
    # sets (zero-shuffle on the fused path, one groupBy on the
    # composition path — built above) expand to ordered pairs in-row —
    # per-turn term counts are small, so the pair expansion is cheap.
    # Pair order from the sorted array gives least/greatest canonical
    # form for free (J6/C5).
    pairs = F.flatten(
        F.transform(
            F.col("ts"),
            lambda x, i: F.transform(
                F.slice(F.col("ts"), i + 2, F.size(F.col("ts"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    co = (
        per_turn_sets.select("conv_id", F.explode(pairs).alias("p"))
        .select(
            F.col("p.a").alias("subj"),
            F.lit("CO_OCCURS_WITH").alias("pred"),
            F.col("p.b").alias("obj"),
            F.col("conv_id").alias("src_conv"),
            F.lit("cooccur").alias("family"),
        )
    )

    # stable-ordering NEXT_TURN edges (reuses the conv partitioning)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    nxt = (
        transcripts.select("conv_id", "turn_idx")
        .withColumn("next_idx", F.lead("turn_idx").over(w))
        .filter(F.col("next_idx").isNotNull())
        .select(
            F.concat(F.lit("turn:"), "conv_id", F.lit(":"), F.col("turn_idx")).alias("subj"),
            F.lit("NEXT_TURN").alias("pred"),
            F.concat(F.lit("turn:"), "conv_id", F.lit(":"), F.col("next_idx")).alias("obj"),
            F.col("conv_id").alias("src_conv"),
            F.lit("next_turn").alias("family"),
        )
    )

    onto = isa_edges.select(
        F.trim("subject_id").alias("subj"),
        normalize_predicate(F.col("predicate")).alias("pred"),
        F.trim("object_id").alias("obj"),
        F.lit(None).cast("string").alias("src_conv"),
        F.lit("ontology").alias("family"),
    )
    onto = canon.apply_canonical(onto, mapping, ["subj", "obj"])

    return (
        mentions_triples.unionByName(has_ns_triples)
        .unionByName(co)
        .unionByName(nxt)
        .unionByName(onto)
    )


def build_triples(
    transcripts: DataFrame,
    terms: DataFrame,
    isa_edges: DataFrame,
    with_src: bool = False,
    lex: Lexicon | None = None,
) -> DataFrame:
    """The full extraction DAG; returns the deduped triple table.

    ``with_src=True`` keeps a ``src_conv`` provenance column (null for
    ontology triples) and dedups per (subj, pred, obj, src_conv) —
    used by the bucket-resumable writer so every transcript-derived
    triple lands in its source conversation's bucket; the global
    triple-set view dedups on read.

    ``lex``: pass a prepared ``Lexicon`` to skip per-run dimension prep
    (the recommended shape for repeated/incremental runs).

    INPUT CONTRACT: one row per (conv_id, turn_idx) — the transcript
    input hint's shape, and what "per-turn text equality under stable
    (conv_id, turn_idx) ordering" presumes. Duplicate turn rows would
    make the fused path compute co-occurrence per ROW while the
    composition fallback merges per TURN (and would also duplicate
    NEXT_TURN edges in both paths); de-duplicate upstream
    (``canon.dedup_keep_first``) before calling if the source can emit
    duplicates.
    """
    if lex is None:
        lex = prepare_lexicon(terms)
    triples = _assemble_triples(transcripts, isa_edges, lex).drop("family")
    if with_src:
        return triples.dropDuplicates(["subj", "pred", "obj", "src_conv"])
    return triples.drop("src_conv").dropDuplicates(["subj", "pred", "obj"])


def build_triples_prov(
    transcripts: DataFrame,
    terms: DataFrame,
    isa_edges: DataFrame,
    lex: Lexicon | None = None,
    run_id: str | None = None,
) -> DataFrame:
    """Triple table with per-triple provenance props.

    Same (subj, pred, obj) set as ``build_triples`` — the P/R gate is
    unchanged — plus extraction-count metrics the reference keeps only
    in import-script logs (neo4j_cancerkg_builder.py counters):

    * ``family``  — which extraction rule produced it (min() of the
      tag: deterministic under the union order, and families are
      disjoint by predicate construction anyway)
    * ``n_obs``   — raw pre-dedup observation count (how often the
      fact was asserted across the corpus)
    * ``n_convs`` — distinct source conversations supporting it
      (0 for ontology rows — count_distinct ignores the null src)
    * ``first_seen_run`` — the producing run id; under MERGE upserts
      pass ``materialize.upsert(...,
      exclude_update_cols=["first_seen_run"])`` (or ``merge_into_sql``'s
      option of the same name) so the column is omitted from the WHEN
      MATCHED update list — first writer wins, giving first-seen
      lineage. The streaming snapshot merge keeps it first-seen via
      ``min`` over zero-padded run ids (incremental_extract_prov).

    One groupBy on the same key the plain path dedups on — identical
    shuffle cost, so provenance is free at scale.
    """
    if lex is None:
        lex = prepare_lexicon(terms)
    return (
        _assemble_triples(transcripts, isa_edges, lex)
        .groupBy("subj", "pred", "obj")
        .agg(
            F.min("family").alias("family"),
            F.count(F.lit(1)).alias("n_obs"),
            F.count_distinct("src_conv").alias("n_convs"),
        )
        .withColumn("first_seen_run", F.lit(run_id).cast("string"))
    )


def build_nodes(triples: DataFrame, terms: DataFrame) -> DataFrame:
    """Node table: typed nodes for every triple endpoint.

    Endpoints with a lexicon row are ``resolved=true`` with props; the
    rest get stub rows (placeholder-node protocol,
    ``neo4j_cancerkg_builder.py:124-139``).
    """
    endpoints = (
        triples.select(F.col("subj").alias("id"))
        .union(triples.select("obj"))
        .distinct()
    )
    labeled = endpoints.withColumn(
        "label",
        F.when(F.col("id").startswith("turn:"), F.lit("Turn"))
        .when(F.col("id").startswith("conv:"), F.lit("Conversation"))
        .otherwise(F.lit("Term")),
    )
    term_props = terms.select(
        F.col("term_id").alias("id"),
        F.create_map(
            F.lit("name"), F.col("name"), F.lit("namespace"), F.col("namespace")
        ).alias("props"),
    )
    return (
        labeled.join(F.broadcast(term_props), "id", "left")
        .select(
            "id",
            "label",
            "props",
            (F.col("props").isNotNull() | (F.col("label") != "Term")).alias("resolved"),
        )
    )


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    terms: DataFrame,
    isa_edges: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Returns (triples, nodes)."""
    triples = build_triples(transcripts, terms, isa_edges)
    nodes = build_nodes(triples, terms)
    return triples, nodes
