"""Nested document-record parsing (S8) — the Spark-native equivalent of
the reference's per-record PubMed XML extraction.

The reference fetches PubMed XML and walks the nested record dict one
article at a time in the driver (``neo4j_pubmed_batch_embeddings_
processor.py:67-328``, duplicated at ``neo4j_cancerkg_builder.py:
176-297``): labeled abstract sections are concatenated as
``"LABEL: text"``, the author list becomes ``AUTHORED {position}``
edges (``PubMedAbstractEmbedding.py:170-203``) and MeSH descriptors
become ``HAS_MESH_TERM`` edges (``PubMedAbstractEmbedding.py:197-215``).

Here the record arrives as ONE nested column (JSON string or struct —
whatever the upstream fetch/XML-to-JSON stage landed in the lake) and
the whole extraction is declarative:

* ``from_json`` with an explicit schema — a narrow JVM-side map, no
  Python, columns pruned by Catalyst;
* labeled-section concat via ``transform`` + ``array_join`` (in-row);
* author edges via ``posexplode`` (1-based position, matching the
  reference's ``i + 1``);
* MeSH edges via ``explode``.

At 100 TB: parsing is embarrassingly parallel (zero shuffle until the
caller dedups), and the explodes amplify rows only by the per-document
author/mesh counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def record_schema() -> T.StructType:
    """PubMed-shaped nested record (the subset the reference extracts)."""
    return T.StructType(
        [
            T.StructField("pmid", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField(
                "abstract",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("label", T.StringType()),
                            T.StructField("text", T.StringType()),
                        ]
                    )
                ),
            ),
            T.StructField(
                "authors",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("last_name", T.StringType()),
                            T.StructField("first_name", T.StringType()),
                            T.StructField("initials", T.StringType()),
                        ]
                    )
                ),
            ),
            T.StructField("mesh", T.ArrayType(T.StringType())),
        ]
    )


def abstract_text(sections: Column | str) -> Column:
    """Concatenate abstract sections, prefixing non-empty labels as
    ``"LABEL: text"`` (``neo4j_pubmed_batch_embeddings_processor.py:
    104-133`` _get_abstract)."""
    s = F.col(sections) if isinstance(sections, str) else sections
    return F.array_join(
        F.transform(
            s,
            lambda x: F.when(
                F.coalesce(x["label"], F.lit("")) != "",
                F.concat(x["label"], F.lit(": "), x["text"]),
            ).otherwise(x["text"]),
        ),
        " ",
    )


def parse_records(df: DataFrame, json_col: str = "record") -> DataFrame:
    """JSON/nested column → flat parsed fields + the nested arrays.

    Output: (pmid, title, abstract, authors, mesh) — ``abstract`` is the
    label-prefixed concat; ``authors``/``mesh`` stay arrays for the edge
    emitters below.
    """
    rec = F.from_json(F.col(json_col), record_schema())
    return df.select(
        rec["pmid"].alias("pmid"),
        rec["title"].alias("title"),
        abstract_text(rec["abstract"]).alias("abstract"),
        rec["authors"].alias("authors"),
        rec["mesh"].alias("mesh"),
    )


def doc_edge_triples(parsed: DataFrame) -> DataFrame:
    """(subj, pred, obj, pos) edges from a parsed record table.

    * ``author:<last>:<initials>`` —AUTHORED(pos 1-based)→ ``pmid:<id>``
      (``PubMedAbstractEmbedding.py:184-192``: MERGE Author by name
      fields, position = i + 1);
    * ``pmid:<id>`` —HAS_MESH_TERM(pos null)→ ``mesh:<descriptor>``
      (``PubMedAbstractEmbedding.py:205-215``).

    Deduped on all four columns (MERGE idempotence, C2).
    """
    pmid_uri = F.concat(F.lit("pmid:"), F.col("pmid"))
    authored = parsed.select(
        pmid_uri.alias("_p"), F.posexplode("authors").alias("_i", "_a")
    ).select(
        F.concat(
            F.lit("author:"), F.col("_a.last_name"), F.lit(":"), F.col("_a.initials")
        ).alias("subj"),
        F.lit("AUTHORED").alias("pred"),
        F.col("_p").alias("obj"),
        (F.col("_i") + 1).cast("long").alias("pos"),
    )
    has_mesh = parsed.select(
        pmid_uri.alias("subj"), F.explode("mesh").alias("_m")
    ).select(
        "subj",
        F.lit("HAS_MESH_TERM").alias("pred"),
        F.concat(F.lit("mesh:"), F.col("_m")).alias("obj"),
        F.lit(None).cast("long").alias("pos"),
    )
    return authored.unionByName(has_mesh).dropDuplicates(["subj", "pred", "obj", "pos"])


def xml_record_schema() -> T.StructType:
    """PubMed efetch XML layout (the element subset the reference walks,
    ``neo4j_pubmed_batch_embeddings_processor.py:67-133``): attributes
    carry the default ``_`` prefix, element text under an attribute-
    bearing element lands in ``_VALUE``."""
    return T.StructType(
        [
            T.StructField(
                "MedlineCitation",
                T.StructType(
                    [
                        T.StructField("PMID", T.StringType()),
                        T.StructField(
                            "Article",
                            T.StructType(
                                [
                                    T.StructField("ArticleTitle", T.StringType()),
                                    T.StructField(
                                        "Abstract",
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "AbstractText",
                                                    T.ArrayType(
                                                        T.StructType(
                                                            [
                                                                T.StructField(
                                                                    "_Label",
                                                                    T.StringType(),
                                                                ),
                                                                T.StructField(
                                                                    "_VALUE",
                                                                    T.StringType(),
                                                                ),
                                                            ]
                                                        )
                                                    ),
                                                ),
                                            ]
                                        ),
                                    ),
                                    T.StructField(
                                        "AuthorList",
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "Author",
                                                    T.ArrayType(
                                                        T.StructType(
                                                            [
                                                                T.StructField(
                                                                    "LastName",
                                                                    T.StringType(),
                                                                ),
                                                                T.StructField(
                                                                    "ForeName",
                                                                    T.StringType(),
                                                                ),
                                                                T.StructField(
                                                                    "Initials",
                                                                    T.StringType(),
                                                                ),
                                                            ]
                                                        )
                                                    ),
                                                ),
                                            ]
                                        ),
                                    ),
                                ]
                            ),
                        ),
                        T.StructField(
                            "MeshHeadingList",
                            T.StructType(
                                [
                                    T.StructField(
                                        "MeshHeading",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "DescriptorName",
                                                        T.StringType(),
                                                    ),
                                                ]
                                            )
                                        ),
                                    ),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
        ]
    )


def parse_xml_records(df: DataFrame, xml_col: str = "record") -> DataFrame:
    """Raw PubMed efetch XML → the same (pmid, title, abstract, authors,
    mesh) contract as ``parse_records`` — Spark 4 ``from_xml`` with an
    explicit schema, so the parse stays a JVM-side narrow map exactly
    like the JSON path (the reference instead walks the XML dict
    per-article in the driver)."""
    rec = F.from_xml(F.col(xml_col), xml_record_schema())
    mc = rec["MedlineCitation"]
    sections = F.transform(
        mc["Article"]["Abstract"]["AbstractText"],
        lambda x: F.struct(
            F.coalesce(x["_Label"], F.lit("")).alias("label"),
            # an empty XML element parses to null where the JSON path
            # carries "" — normalize so both formats emit equal rows
            F.coalesce(x["_VALUE"], F.lit("")).alias("text"),
        ),
    )
    authors = F.transform(
        mc["Article"]["AuthorList"]["Author"],
        lambda a: F.struct(
            a["LastName"].alias("last_name"),
            a["ForeName"].alias("first_name"),
            a["Initials"].alias("initials"),
        ),
    )
    mesh = F.transform(
        mc["MeshHeadingList"]["MeshHeading"], lambda m: m["DescriptorName"]
    )
    return df.select(
        mc["PMID"].alias("pmid"),
        F.coalesce(mc["Article"]["ArticleTitle"], F.lit("")).alias("title"),
        abstract_text(sections).alias("abstract"),
        authors.alias("authors"),
        mesh.alias("mesh"),
    )


def _xml_escape(c: Column) -> Column:
    c = F.regexp_replace(c, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def synth_xml_records(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PubMed-efetch-shaped XML records — the same fields
    as ``synth_json_records`` rendered in the reference's actual wire
    format (PubmedArticle > MedlineCitation > Article ...), so the XML
    and JSON parse paths can be cross-checked against one oracle."""
    toks = F.split(F.trim("text"), r"\s+")
    did = F.col(id_col).cast("string")
    n_auth = (F.col(id_col) % 3 + 1).cast("int")
    title = _xml_escape(F.array_join(F.slice(toks, 1, 5), " "))
    sec1 = _xml_escape(F.array_join(F.slice(toks, 6, 8), " "))
    sec2 = _xml_escape(F.array_join(F.slice(toks, 14, 8), " "))
    authors_xml = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_auth),
            lambda i: F.concat(
                F.lit("<Author><LastName>Auth"),
                did,
                F.lit("_"),
                i.cast("string"),
                F.lit("</LastName><ForeName>First</ForeName><Initials>A"),
                i.cast("string"),
                F.lit("</Initials></Author>"),
            ),
        ),
        "",
    )
    mesh_xml = F.concat(
        F.lit("<MeshHeading><DescriptorName>"),
        _xml_escape(F.upper("lang")),
        F.lit("</DescriptorName></MeshHeading><MeshHeading><DescriptorName>"),
        _xml_escape(F.upper("source")),
        F.lit("</DescriptorName></MeshHeading>"),
    )
    xml = F.concat(
        F.lit("<PubmedArticle><MedlineCitation><PMID>"),
        did,
        F.lit("</PMID><Article><ArticleTitle>"),
        title,
        F.lit('</ArticleTitle><Abstract><AbstractText Label="BACKGROUND">'),
        sec1,
        F.lit("</AbstractText><AbstractText>"),
        sec2,
        F.lit("</AbstractText></Abstract><AuthorList>"),
        authors_xml,
        F.lit("</AuthorList></Article><MeshHeadingList>"),
        mesh_xml,
        F.lit("</MeshHeadingList></MedlineCitation></PubmedArticle>"),
    )
    return docs.select(F.col(id_col), xml.alias("record"))


def synth_json_records(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PubMed-shaped JSON records synthesized from the
    ``documents`` table — the test/driver stand-in for the reference's
    live Entrez fetch (this container has no network; the fetch itself
    is a driver-side concern per SURVEY S7/S8 disposition).

    Shape per doc: pmid = doc_id; title = tokens 1-5; two abstract
    sections (labeled BACKGROUND + an unlabeled one); 1 + doc_id % 3
    authors; mesh = [upper(lang), upper(source)]. Reproducible in any
    engine from the same parquet — the DuckDB oracle rebuilds it.
    """
    toks = F.split(F.trim("text"), r"\s+")
    did = F.col(id_col).cast("string")
    n_auth = (F.col(id_col) % 3 + 1).cast("int")
    rec = F.struct(
        did.alias("pmid"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("title"),
        F.array(
            F.struct(
                F.lit("BACKGROUND").alias("label"),
                F.array_join(F.slice(toks, 6, 8), " ").alias("text"),
            ),
            F.struct(
                F.lit("").alias("label"),
                F.array_join(F.slice(toks, 14, 8), " ").alias("text"),
            ),
        ).alias("abstract"),
        F.transform(
            F.sequence(F.lit(1), n_auth),
            lambda i: F.struct(
                F.concat(F.lit("Auth"), did, F.lit("_"), i.cast("string")).alias(
                    "last_name"
                ),
                F.lit("First").alias("first_name"),
                F.concat(F.lit("A"), i.cast("string")).alias("initials"),
            ),
        ).alias("authors"),
        F.array(F.upper("lang"), F.upper("source")).alias("mesh"),
    )
    return docs.select(F.col(id_col), F.to_json(rec).alias("record"))
