"""Generic graph-import operators: edge-table and fact-table ingestion.

These re-express the two big import shapes of the reference beyond
ontology/transcript processing:

* **edge table** (MonarchKG TSV, ``src/BioOntologyKG/importers/monarchkg/
  import_monarchkg_relationships.py:56-140`` and
  ``cql/import/monarchkg/import_monarchkg_nodes.cql``): rows carry
  (subject, predicate, object) plus metadata; humans-only taxon filter,
  bracketed-list publications parse, dynamic predicates preserved.
* **fact table** (COSMIC star schema, ``cql/import/cosmic/
  import_cosmic_mutant_census.cql:26-58``): one row fans out into a
  keyed node upsert plus one FK edge per non-null dimension reference,
  with type casts, list splits, trim hygiene, and stub (placeholder)
  nodes for FK targets that don't resolve
  (``neo4j_cancerkg_builder.py:124-139``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_bracketed_list(col) -> F.Column:
    """``"['PMID:1', 'PMID:2']"`` → array<string> (P4,
    import_monarchkg_relationships.py:26-40): strip brackets/quotes,
    split on comma, trim, drop empties."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.transform(
            F.split(F.regexp_replace(c, r"[\[\]']", ""), ","), lambda x: F.trim(x)
        ),
        lambda x: x != "",
    )


def import_edge_table(
    rows: DataFrame,
    taxon_col: str | None = "subject_taxon",
    keep_taxon: str = "NCBITaxon:9606",
    publications_col: str | None = "publications",
) -> DataFrame:
    """MonarchKG-style edge rows → (subj, pred, obj, props) triples.

    * taxon filter: keep rows whose taxon is null or contains the kept
      taxon (P10 — substring-contains deliberately mirrors the
      reference's own semantics, import_monarchkg_relationships.py:
      100-101; note it also admits ids extending the kept one, e.g.
      ``NCBITaxon:96061`` — a reference behavior, preserved for parity);
    * dynamic predicate from the row, trimmed (the reference passes
      ``biolink:causes`` through verbatim);
    * ``publications`` bracketed list parsed and carried as a
      comma-joined prop (props stay map<string,string>);
    * MERGE-idempotence via dropDuplicates on the triple key.
    """
    df = rows
    if taxon_col and taxon_col in df.columns:
        df = df.filter(
            F.col(taxon_col).isNull() | F.col(taxon_col).contains(keep_taxon)
        )
    props_entries = [
        (F.lit("primary_knowledge_source"), F.col("primary_knowledge_source"))
        if "primary_knowledge_source" in df.columns
        else None,
        (
            F.lit("publications"),
            F.concat_ws(",", parse_bracketed_list(publications_col)),
        )
        if publications_col and publications_col in df.columns
        else None,
    ]
    entries = [e for e in props_entries if e is not None]
    props = (
        F.map_from_arrays(
            F.array(*[e[0] for e in entries]), F.array(*[e[1] for e in entries])
        )
        if entries
        else F.lit(None).cast("map<string,string>")
    )
    return (
        df.select(
            F.trim("subject").alias("subj"),
            F.trim("predicate").alias("pred"),
            F.trim("object").alias("obj"),
            props.alias("props"),
        )
        .filter((F.col("subj") != "") & (F.col("obj") != ""))
        .dropDuplicates(["subj", "pred", "obj"])
    )


@dataclass
class FactSpec:
    """Declarative import spec for one fact table (the Spark form of one
    COSMIC CQL script)."""

    key_col: str
    node_label: str
    int_cols: tuple[str, ...] = ()
    double_cols: tuple[str, ...] = ()
    split_cols: dict = field(default_factory=dict)  # col -> separator
    fk_edges: dict = field(default_factory=dict)  # fk col -> predicate


def import_fact_table(rows: DataFrame, spec: FactSpec) -> tuple[DataFrame, DataFrame]:
    """Fact rows → (nodes, edges).

    * key trimmed; null/empty keys dropped (P11 null-key guard,
      import_cosmic_fusion.cql:57-58);
    * ``toInteger``/``toFloat`` casts with empty-string→null guards
      (import_cosmic_gene_census.cql:38-39, import_cosmic_cmc.cql:21-50);
    * list splits (import_cosmic_gene_census.cql:40-43);
    * duplicate keys resolve deterministically: min by row content hash
      (C1 first-writer-wins replaced per SURVEY.md §7.5.2);
    * one edge per non-null FK, FK trimmed (C6 hygiene); FK targets get
      stub nodes with ``resolved=false`` (C7 placeholder protocol).
    """
    df = rows.withColumn(spec.key_col, F.trim(spec.key_col)).filter(
        F.col(spec.key_col).isNotNull() & (F.col(spec.key_col) != "")
    )
    # try_cast ≡ Cypher toInteger/toFloat: malformed input → null (plain
    # cast would throw under ANSI mode)
    for c in spec.int_cols:
        df = df.withColumn(c, F.trim(c).try_cast("long"))
    for c in spec.double_cols:
        df = df.withColumn(c, F.trim(c).try_cast("double"))
    for c, sep in spec.split_cols.items():
        df = df.withColumn(
            c,
            F.filter(
                F.transform(F.split(F.col(c), sep), lambda x: F.trim(x)),
                lambda x: x != "",
            ),
        )

    from .canon import dedup_keep_first

    value_cols = [c for c in df.columns if c != spec.key_col]
    deduped = dedup_keep_first(
        df,
        [spec.key_col],
        [F.xxhash64(*[F.col(c).cast("string") for c in value_cols])],
    )

    prop_cols = [
        c
        for c in deduped.columns
        if c != spec.key_col and c not in spec.fk_edges
    ]
    nodes = deduped.select(
        F.col(spec.key_col).alias("id"),
        F.lit(spec.node_label).alias("label"),
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in prop_cols]),
            F.array(
                *[
                    F.when(
                        F.col(c).isNotNull(),
                        F.col(c).cast("string")
                        if dict(deduped.dtypes)[c].startswith(("bigint", "double", "string"))
                        else F.concat_ws(",", F.col(c)),
                    )
                    for c in prop_cols
                ]
            ),
        ).alias("props"),
        F.lit(True).alias("resolved"),
    )

    edge_parts = []
    stub_parts = []
    for fk, pred in spec.fk_edges.items():
        fkc = F.trim(F.col(fk))
        e = deduped.filter(F.col(fk).isNotNull() & (fkc != "")).select(
            F.col(spec.key_col).alias("subj"),
            F.lit(pred).alias("pred"),
            fkc.alias("obj"),
        )
        edge_parts.append(e)
        stub_parts.append(e.select(F.col("obj").alias("id")))

    if edge_parts:
        edges = edge_parts[0]
        for e in edge_parts[1:]:
            edges = edges.unionByName(e)
        edges = edges.dropDuplicates(["subj", "pred", "obj"])
        stubs = stub_parts[0]
        for s in stub_parts[1:]:
            stubs = stubs.unionByName(s)
        stubs = (
            stubs.distinct()
            .join(nodes.select("id"), "id", "left_anti")
            .select(
                "id",
                F.lit("Stub").alias("label"),
                F.lit(None).cast("map<string,string>").alias("props"),
                F.lit(False).alias("resolved"),
            )
        )
        nodes = nodes.unionByName(stubs)
    else:
        edges = rows.sparkSession.createDataFrame(
            [], "subj string, pred string, obj string"
        )
    return nodes, edges
