"""Whole-platform composition: all import families into one graph."""

from pyspark.sql import functions as F

from kgflow.operators import imports
from kgflow.plans import full_graph, materialize


def test_full_graph_composition(spark, transcripts, lexicon, tmp_path):
    terms, isa = lexicon

    edge_rows = spark.createDataFrame(
        [
            ("KG:0000001", "g", "NCBITaxon:9606", "biolink:causes",
             "MONDO:1", "d", "src", "['PMID:1']"),
        ],
        "subject string, subject_category string, subject_taxon string, "
        "predicate string, object string, object_category string, "
        "primary_knowledge_source string, publications string",
    )
    fact_rows = spark.createDataFrame(
        [("M1", "KG:0000001", "10", "1.5", "a,b", "0.1")],
        "MUTATION_ID string, GENE_ID string, GENOME_START string, "
        "PLOIDY string, TYPES string, AF string",
    )
    spec = imports.FactSpec(
        key_col="MUTATION_ID",
        node_label="Mutation",
        int_cols=("GENOME_START",),
        double_cols=("PLOIDY", "AF"),
        split_cols={"TYPES": ","},
        fk_edges={"GENE_ID": "HAS_GENE"},
    )

    nodes, edges = full_graph.build_full_graph(
        spark,
        transcripts=transcripts,
        terms=terms,
        isa_edges=isa,
        edge_rows=edge_rows,
        fact_rows=fact_rows,
        fact_spec=spec,
    )

    # cross-family linkage: KG:0000001 appears as a lexicon term node,
    # a MonarchKG edge subject, and a COSMIC FK target — one node row
    n = nodes.filter(F.col("id") == "KG:0000001").collect()
    assert len(n) == 1
    assert n[0].resolved  # term row beats the stub rows

    preds = {r.pred for r in edges.select("pred").distinct().collect()}
    assert {"MENTIONS", "biolink:causes", "HAS_GENE", "NEXT_TURN"} <= preds

    # unique keys after consolidation
    assert nodes.count() == nodes.select("id").distinct().count()
    assert edges.count() == edges.dropDuplicates(["subj", "pred", "obj"]).count()

    # idempotent materialization round-trip
    out = str(tmp_path / "graph")
    full_graph.materialize_graph(nodes, edges, out)
    full_graph.materialize_graph(nodes, edges, out)
    back_n = materialize.read_table(spark, f"{out}/nodes")
    back_e = materialize.read_table(spark, f"{out}/edges")
    assert back_n.count() == nodes.count()
    assert back_e.count() == edges.count()
