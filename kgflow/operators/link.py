"""Entity linking: surface strings → lexicon term ids via broadcast joins.

Re-expresses the reference's MERGE-by-business-key entity resolution
(``cql/import/cosmic/import_cosmic_mutant_census.cql:36-38`` MATCH dim by
key then MERGE edge) as explicit broadcast hash joins (SURVEY.md §2.3 J1).

Key hygiene is applied on BOTH sides before the join — the reference had
to ship a remediation script for whitespace-polluted keys
(``cql/remediation/remediate_uniprot_pubmed_ids.cql:8-26``); we normalize
at build time (SURVEY.md §2.8 C6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def surface_dim(terms: DataFrame) -> DataFrame:
    """Lexicon terms → (surface, term_id, namespace) link dimension.

    * name + each synonym becomes a surface (pipe-split semantics of
      ``cql/import/import_hgnc.cql:34-38`` already normalized to arrays).
    * surfaces trimmed + lower-cased (C6 hygiene).
    * obsolete terms are excluded — they must not link
      (``import_go_obo.py:105``).
    * one winner per surface: deterministic min(term_id) tie-break
      replaces MERGE first-writer-wins (SURVEY.md §7.5.2).
    """
    live = terms.filter(~F.coalesce(F.col("is_obsolete"), F.lit(False)))
    surfaces = live.select(
        F.explode(
            F.array_union(F.array(F.col("name")), F.coalesce(F.col("synonyms"), F.array()))
        ).alias("surface_raw"),
        "term_id",
        "namespace",
    )
    cleaned = surfaces.select(
        F.lower(F.trim(F.col("surface_raw"))).alias("surface"), "term_id", "namespace"
    ).filter(F.col("surface") != "")
    return cleaned.groupBy("surface").agg(
        F.min("term_id").alias("term_id"),
        F.min_by("namespace", "term_id").alias("namespace"),
    )


def link_mentions(mentions: DataFrame, dim: DataFrame) -> DataFrame:
    """mentions (surface) ⨝ broadcast(dim) → linked mentions with term_id.

    Inner join: unlinkable surfaces are dropped, matching the reference's
    MATCH-then-MERGE (edge only emitted when the dim row exists, J1/J2).
    """
    return mentions.join(F.broadcast(dim), "surface", "inner")


def prefix_match_join(
    facts: DataFrame,
    dims: DataFrame,
    fact_col: str,
    dim_col: str,
) -> DataFrame:
    """Theta 'STARTS WITH' join re-expressed as a derived-key equi join
    (J3) — the reference's ``WHERE u.Entry_Name STARTS WITH
    g.GENE_SYMBOL`` over UniProt entry names like ``BRCA1_HUMAN``
    (``import_cosmic_genes.cql:41-46``).

    Exact STARTS WITH semantics: ``fact STARTS WITH dim`` ⇔
    ``substr(fact, 1, len(dim)) = dim``. The dim side is
    dimension-scale, so its set of DISTINCT key lengths is tiny
    (bounded by the longest symbol); each fact row derives one
    candidate prefix per distinct length and Catalyst gets a broadcast
    hash join on the derived prefix — never a nested loop. The literal
    ``startswith(dim)`` is kept as a (free) post-join verify. Row
    amplification = number of distinct dim key lengths, so the fan-out
    is a dim-side property independent of fact cardinality. Unlike the
    earlier first-separator-segment key, this matches dims that
    themselves contain the separator (``ABC_1`` → ``ABC_1_HUMAN``) and
    boundary-free prefixes (``BRCA1`` → ``BRCA12_HUMAN``), exactly as
    the reference's STARTS WITH does.
    """
    # one driver-side scan of the dimension table (broadcast-scale by
    # contract — same size class as the broadcast itself)
    lengths = sorted(
        r[0]
        for r in dims.select(F.length(dim_col)).distinct().collect()
        if r[0] is not None and r[0] > 0
    )
    if not lengths:
        return facts.join(F.broadcast(dims), F.lit(False))
    candidates = F.array_distinct(
        F.array(*[F.col(fact_col).substr(F.lit(1), F.lit(int(l))) for l in lengths])
    )
    derived = facts.withColumn("_pk", F.explode(candidates))
    return (
        derived.join(F.broadcast(dims), derived["_pk"] == dims[dim_col])
        .filter(F.col(fact_col).startswith(F.col(dim_col)))
        .drop("_pk")
    )


def alt_id_edges(terms: DataFrame) -> DataFrame:
    """Same-as links (term_id ↔ alt_id) for canonicalization input.

    Generalization of the Gene↔biolink:Gene consolidation
    (``cql/remediation/remediate_gene_node.cql:5-52``).
    """
    return (
        terms.select("term_id", F.explode("alt_ids").alias("alt_id"))
        .select(
            F.col("term_id").alias("id_a"),
            F.col("alt_id").alias("id_b"),
        )
        .filter(F.col("id_b").isNotNull() & (F.trim("id_b") != ""))
    )
