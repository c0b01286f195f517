"""Whole-platform composition: every import family into one graph.

A reference user runs, in sequence: ontology loads (OBO), bulk
edge-table imports (MonarchKG TSV), star-schema fact imports (COSMIC
CSVs), and document/citation enrichment — all MERGEing into one Neo4j
graph. This module is the Spark equivalent of that whole workflow: each
source family goes through its operator, and the results union into a
single deduped (nodes, edges) pair materialized with MERGE semantics.

Node table: (id, label, props, resolved); edge table: (subj, pred, obj).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import imports
from . import materialize, pipeline


def build_full_graph(
    spark: SparkSession,
    transcripts: DataFrame | None = None,
    terms: DataFrame | None = None,
    isa_edges: DataFrame | None = None,
    edge_rows: DataFrame | None = None,
    fact_rows: DataFrame | None = None,
    fact_spec: imports.FactSpec | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Union all supplied source families into one (nodes, edges) graph.

    Any subset of sources may be supplied; each goes through its
    family-specific operator and the union is deduped on business keys
    (C1/C2 MERGE semantics).
    """
    node_parts: list[DataFrame] = []
    edge_parts: list[DataFrame] = []

    if transcripts is not None and terms is not None and isa_edges is not None:
        triples, nodes = pipeline.run_pipeline(spark, transcripts, terms, isa_edges)
        node_parts.append(nodes)
        edge_parts.append(triples.select("subj", "pred", "obj"))

    if edge_rows is not None:
        et = imports.import_edge_table(edge_rows)
        edge_parts.append(et.select("subj", "pred", "obj"))
        endpoints = (
            et.select(F.col("subj").alias("id"))
            .union(et.select("obj"))
            .distinct()
            .select(
                "id",
                F.lit("Entity").alias("label"),
                F.lit(None).cast("map<string,string>").alias("props"),
                F.lit(False).alias("resolved"),
            )
        )
        node_parts.append(endpoints)

    if fact_rows is not None and fact_spec is not None:
        fn, fe = imports.import_fact_table(fact_rows, fact_spec)
        node_parts.append(fn)
        edge_parts.append(fe)

    if not edge_parts:
        raise ValueError("no sources supplied")

    edges = edge_parts[0]
    for e in edge_parts[1:]:
        edges = edges.unionByName(e)
    edges = edges.dropDuplicates(["subj", "pred", "obj"])

    nodes = node_parts[0]
    for n in node_parts[1:]:
        nodes = nodes.unionByName(n)
    # resolved rows win over stubs for the same id (C4 consolidation:
    # keep the richest row deterministically)
    from ..operators.canon import dedup_keep_first

    nodes = dedup_keep_first(
        nodes,
        ["id"],
        [F.desc("resolved"), F.asc("label"), F.asc(F.xxhash64(F.col("props").cast("string")))],
    )
    return nodes, edges


def materialize_graph(
    nodes: DataFrame, edges: DataFrame, out_dir: str
) -> None:
    """Idempotent MERGE-style persistence of both tables."""
    materialize.upsert(nodes, f"{out_dir}/nodes", keys=["id"])
    materialize.upsert(edges, f"{out_dir}/edges", keys=["subj", "pred", "obj"])
