"""Canonical StructTypes for every table the engine touches.

The shapes derive from the reference's data model (SURVEY.md §1) and from
``BASELINE.json.input_hint`` (transcripts). Keeping hot keys as top-level
columns (not inside the dynamic ``props`` map) is deliberate: Catalyst
column pruning and parquet predicate pushdown only work on real columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

# -- pipeline input ---------------------------------------------------------

#: BASELINE.json input_hint: multi-turn conversation / agent transcripts.
TRANSCRIPT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# -- lexicon dimensions (GO/HGNC/SO-style term tables; SURVEY.md §1.1) ------

LEXICON_TERM = T.StructType(
    [
        T.StructField("term_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("namespace", T.StringType(), True),
        T.StructField("definition", T.StringType(), True),
        T.StructField("synonyms", T.ArrayType(T.StringType()), True),
        T.StructField("xrefs", T.ArrayType(T.StringType()), True),
        T.StructField("alt_ids", T.ArrayType(T.StringType()), True),
        T.StructField("is_obsolete", T.BooleanType(), True),
    ]
)

#: ontology hierarchy triples from OBO parse (import_go_obo.py:115-145).
LEXICON_ISA_EDGE = T.StructType(
    [
        T.StructField("subject_id", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object_id", T.StringType(), False),
    ]
)

# -- intermediate shapes ----------------------------------------------------

#: one detected lexicon mention inside a turn's text.
MENTION = T.StructType(
    [
        T.StructField("term_id", T.StringType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)

MENTION_ROW = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("mentions", T.ArrayType(MENTION), False),
    ]
)

# -- outputs ----------------------------------------------------------------

#: the scored comparison set shape: (subj, pred, obj) + provenance props.
TRIPLE = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

NODE = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("resolved", T.BooleanType(), False),
    ]
)

#: per-partition lineage ledger for resumable restarts (SURVEY.md §4 item 4).
LEDGER = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("input_fingerprint", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("mentions_out", T.LongType(), False),
        T.StructField("triples_out", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
