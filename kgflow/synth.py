"""Deterministic synthetic-data generators (transcripts + lexicon).

The transcript generator is **distributed**: rows are produced by
``spark.range`` + column expressions + one Arrow-batched pandas stage, so
the identical code that makes a 10^4-turn test table would make a
10^12-turn table on a cluster (no driver-side loops, no ``rand()`` —
everything is a pure function of the row id and the seed, so re-running
yields byte-identical data, which the checkpoint/resume tests rely on).

The lexicon generator is driver-side on purpose: ontology lexicons are
MB-scale dimension tables in the reference too (OBO files parsed in the
driver, ``src/BioOntologyKG/importers/import_go_obo.py:64-145``) and are
broadcast to executors.
"""

from __future__ import annotations

import itertools
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas

# Word pools: filler vocabulary plus term surface vocabulary. Surfaces are
# two-word phrases so mention detection is not a trivial token lookup.
_FILLER = (
    "the a and then we see it run check result from with into over under "
    "please tool call output state error retry done next step plan note "
    "model data batch row table key value file line code test case graph"
).split()

_SURFACE_HEADS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega"
).split()
_SURFACE_TAILS = (
    "kinase receptor pathway factor domain complex channel ligase helicase "
    "synthase protease cyclase transporter repressor activator"
).split()

_ROLES = ("user", "assistant", "tool")
_TOOLS = (None, "search", "python", "browser", "editor")
_NAMESPACES = ("biological_process", "molecular_function", "cellular_component")
_PREDICATES = ("is_a", "part_of", "regulates", "positively_regulates")


def make_lexicon(n_terms: int = 200, seed: int = 7) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build (terms, isa_edges) pandas frames, FIXTURES.md §2/§3 shapes.

    Surfaces are unique two-word phrases; each term gets 0–2 synonyms
    (distinct phrases), ~3%% obsolete terms (must not link,
    ``import_go_obo.py:105``), and alt_ids forming same-as chains for
    canonicalization tests.
    """
    rng = random.Random(seed)
    phrases = [f"{h} {t}" for h, t in itertools.product(_SURFACE_HEADS, _SURFACE_TAILS)]
    rng.shuffle(phrases)
    need = n_terms * 3
    if need > len(phrases):
        phrases = [
            f"{h} {t} {i}"
            for i, (h, t) in enumerate(
                itertools.islice(itertools.cycle(itertools.product(_SURFACE_HEADS, _SURFACE_TAILS)), need)
            )
        ]
        rng.shuffle(phrases)
    pool = iter(phrases)

    terms = []
    for i in range(n_terms):
        name = next(pool)
        n_syn = rng.choice((0, 1, 1, 2))
        syns = [next(pool) for _ in range(n_syn)]
        terms.append(
            {
                "term_id": f"KG:{i:07d}",
                "name": name,
                "namespace": _NAMESPACES[i % len(_NAMESPACES)],
                "definition": f"definition of {name}",
                "synonyms": syns,
                "xrefs": [f"XR:{i:05d}"],
                "alt_ids": [f"ALT:{i:07d}"] if i % 5 == 0 else [],
                "is_obsolete": (i % 37 == 13),
            }
        )
    terms_pdf = pd.DataFrame(terms)

    edges = []
    for i in range(1, n_terms):
        parent = rng.randrange(0, i)
        pred = _PREDICATES[rng.randrange(len(_PREDICATES))]
        edges.append(
            {
                "subject_id": f"KG:{i:07d}",
                "predicate": pred,
                "object_id": f"KG:{parent:07d}",
            }
        )
    edges_pdf = pd.DataFrame(edges)
    return terms_pdf, edges_pdf


def lexicon_dataframes(spark: SparkSession, n_terms: int = 200, seed: int = 7) -> tuple[DataFrame, DataFrame]:
    terms_pdf, edges_pdf = make_lexicon(n_terms, seed)
    terms = spark.createDataFrame(terms_pdf, schema=schemas.LEXICON_TERM)
    edges = spark.createDataFrame(edges_pdf, schema=schemas.LEXICON_ISA_EDGE)
    return terms, edges


def _turn_text(rng: random.Random, surfaces: list[str], zipf_s: float) -> str:
    """One turn's text: filler words with seeded mentions.

    Term choice is Zipf-skewed (``idx = floor(N * u**zipf_s)``) so a
    handful of terms are super-nodes — exercises the skew-salting path.
    Near-miss negatives (surface head without its tail) are planted so a
    sloppy matcher over-matches.
    """
    n_words = 8 + rng.randrange(40)
    out: list[str] = []
    while len(out) < n_words:
        r = rng.random()
        if r < 0.18:  # plant a mention
            u = rng.random()
            idx = min(int(len(surfaces) * (u**zipf_s)), len(surfaces) - 1)
            out.extend(surfaces[idx].split())
        elif r < 0.24:  # near-miss negative: head word alone
            u = rng.random()
            idx = min(int(len(surfaces) * (u**zipf_s)), len(surfaces) - 1)
            out.append(surfaces[idx].split()[0])
        else:
            out.append(_FILLER[rng.randrange(len(_FILLER))])
    return " ".join(out)


def transcripts(
    spark: SparkSession,
    n_turns: int = 20_000,
    n_convs: int = 1_000,
    lexicon_pdf: pd.DataFrame | None = None,
    seed: int = 42,
    zipf_s: float = 3.0,
    conv_skew: float = 2.5,
) -> DataFrame:
    """Distributed deterministic transcript table (input_hint schema).

    ``conv_skew`` > 1 gives a long-tailed conversation-length
    distribution (a few huge conversations), matching the Zipf-skewed
    lengths called for by FIXTURES.md §1.
    """
    if lexicon_pdf is None:
        lexicon_pdf, _ = make_lexicon()
    surfaces: list[str] = []
    for row in lexicon_pdf.itertuples():
        surfaces.append(row.name)
        surfaces.extend(row.synonyms)
    bc = spark.sparkContext.broadcast((surfaces, seed, zipf_s))

    # conv assignment: u = hash01(id); conv = floor(n_convs * u**conv_skew)
    df = spark.range(n_turns).select(
        F.col("id"),
        (
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0
        ).alias("u"),
    )
    df = df.select(
        "id",
        F.format_string(
            "conv-%06d",
            F.least(
                F.floor(F.lit(float(n_convs)) * F.pow("u", F.lit(conv_skew))).cast("int"),
                F.lit(n_convs - 1),
            ),
        ).alias("conv_id"),
    )
    # turn_idx: dense order of ids within a conversation (one generation-time
    # shuffle; the written table is then the stable input).
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("id")
    df = df.select(
        "id",
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        surfaces_, seed_, zipf_ = bc.value
        for pdf in batches:
            texts, roles, tools, tss = [], [], [], []
            for rid, tidx in zip(pdf["id"], pdf["turn_idx"]):
                rng = random.Random((seed_ << 32) ^ int(rid))
                roles.append(_ROLES[int(tidx) % 3])
                tools.append(_TOOLS[rng.randrange(len(_TOOLS))] if int(tidx) % 3 == 2 else None)
                texts.append(_turn_text(rng, surfaces_, zipf_))
                tss.append(
                    pd.Timestamp("2025-01-01", tz="UTC")
                    + pd.Timedelta(seconds=int(rid) % 86_400_000)
                )
            out = pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"],
                    "role": roles,
                    "text": texts,
                    "tool": tools,
                    "ts": tss,
                }
            )
            yield out

    return df.mapInPandas(gen, schema=schemas.TRANSCRIPT)


def write_transcripts(
    spark: SparkSession,
    path: str,
    n_turns: int,
    n_convs: int,
    buckets: int = 32,
    seed: int = 42,
    lexicon_pdf: pd.DataFrame | None = None,
) -> None:
    """Materialize transcripts partitioned by conv_id-hash bucket.

    ``bucket = pmod(xxhash64(conv_id), buckets)`` — the explicit
    partitioning the north rule requires; readers get conversation
    locality without a shuffle.
    """
    df = transcripts(
        spark, n_turns=n_turns, n_convs=n_convs, seed=seed, lexicon_pdf=lexicon_pdf
    )
    (
        df.withColumn("bucket", F.pmod(F.xxhash64("conv_id"), F.lit(buckets)).cast("int"))
        .repartition("bucket")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
