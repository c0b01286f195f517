"""Edge-table and fact-table import operators (FIXTURES.md §4/§5)."""

from kgflow.operators import imports


def test_edge_table_taxon_filter_and_publications(spark):
    rows = spark.createDataFrame(
        [
            ("HGNC:1", "biolink:Gene", "NCBITaxon:9606", "biolink:causes",
             "MONDO:1", "biolink:Disease", "infores:omim", "['PMID:1', 'PMID:2']"),
            ("HGNC:2", "biolink:Gene", "NCBITaxon:10090", "biolink:causes",
             "MONDO:2", "biolink:Disease", "infores:omim", "[]"),
            ("HGNC:3", "biolink:Gene", None, "biolink:interacts_with",
             "HGNC:4", "biolink:Gene", None, None),
            ("HGNC:1 ", "biolink:Gene", "NCBITaxon:9606", "biolink:causes",
             " MONDO:1", "biolink:Disease", "infores:omim", "['PMID:1', 'PMID:2']"),
        ],
        "subject string, subject_category string, subject_taxon string, "
        "predicate string, object string, object_category string, "
        "primary_knowledge_source string, publications string",
    )
    out = imports.import_edge_table(rows)
    got = {(r.subj, r.pred, r.obj): r.props for r in out.collect()}
    # mouse row dropped; trimmed duplicate merged; dynamic predicates kept
    assert set(got) == {
        ("HGNC:1", "biolink:causes", "MONDO:1"),
        ("HGNC:3", "biolink:interacts_with", "HGNC:4"),
    }
    assert got[("HGNC:1", "biolink:causes", "MONDO:1")]["publications"] == "PMID:1,PMID:2"


def test_fact_table_casts_stubs_and_edges(spark):
    rows = spark.createDataFrame(
        [
            ("M1", "G1", "S1", " 123 ", "", "a,b , c", "0.5"),
            ("M2", "G1", None, "456", "7.5", "", ""),
            ("M2", "G1", None, "456", "7.5", "", ""),  # exact dup row
            ("", "G9", "S9", "1", "1", "x", "1"),  # null-key guard
            ("M3", " G2 ", "S2", "bad?", "2.5", "d", "0.25"),
        ],
        "MUTATION_ID string, COSMIC_GENE_ID string, COSMIC_SAMPLE_ID string, "
        "GENOME_START string, AVERAGE_PLOIDY string, TUMOUR_TYPES string, AF_SCORE string",
    )
    spec = imports.FactSpec(
        key_col="MUTATION_ID",
        node_label="COSMIC_MutantCensus",
        int_cols=("GENOME_START",),
        double_cols=("AVERAGE_PLOIDY", "AF_SCORE"),
        split_cols={"TUMOUR_TYPES": ","},
        fk_edges={"COSMIC_GENE_ID": "HAS_GENE", "COSMIC_SAMPLE_ID": "HAS_SAMPLE"},
    )
    nodes, edges = imports.import_fact_table(rows, spec)
    n = {r.id: r for r in nodes.collect()}
    e = {(r.subj, r.pred, r.obj) for r in edges.collect()}

    assert set(n) == {"M1", "M2", "M3", "G1", "G2", "S1", "S2"}
    assert n["M1"].resolved and not n["G1"].resolved
    assert n["G1"].label == "Stub"
    # casts: int ok, empty string -> absent (null prop filtered), bad int -> null
    assert n["M1"].props["GENOME_START"] == "123"
    assert n["M1"].props["TUMOUR_TYPES"] == "a,b,c"
    assert n["M1"].props.get("AVERAGE_PLOIDY") is None
    assert n["M3"].props.get("GENOME_START") is None
    assert n["M2"].props["AVERAGE_PLOIDY"] == "7.5"
    assert e == {
        ("M1", "HAS_GENE", "G1"),
        ("M1", "HAS_SAMPLE", "S1"),
        ("M2", "HAS_GENE", "G1"),
        ("M3", "HAS_GENE", "G2"),
        ("M3", "HAS_SAMPLE", "S2"),
    }


def test_fact_table_duplicate_key_deterministic(spark):
    rows = spark.createDataFrame(
        [("K", "G1", "1", "", "", ""), ("K", "G2", "2", "", "", "")],
        "MUTATION_ID string, COSMIC_GENE_ID string, GENOME_START string, "
        "AVERAGE_PLOIDY string, TUMOUR_TYPES string, AF_SCORE string",
    )
    spec = imports.FactSpec(
        key_col="MUTATION_ID",
        node_label="X",
        int_cols=("GENOME_START",),
        fk_edges={"COSMIC_GENE_ID": "HAS_GENE"},
    )
    n1, _ = imports.import_fact_table(rows, spec)
    n2, _ = imports.import_fact_table(rows, spec)
    r1 = {r.id: r.props for r in n1.collect()}
    r2 = {r.id: r.props for r in n2.collect()}
    assert r1 == r2  # deterministic winner, not first-writer-wins
