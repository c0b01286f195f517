"""Mention detection + surface extraction over transcript text.

Replaces the reference's per-record Python NLP/enrichment hop
(``neo4j_pubmed_batch_embeddings_processor.py:67-328`` parses records one
at a time in the driver) with a single Arrow-batched ``mapInPandas``
stage: a greedy longest-match dictionary automaton built once per
executor from a broadcast surface list scans each text batch.

Scale notes:
* No shuffle — extraction is embarrassingly parallel over the
  conv_id-hash bucketed input partitions.
* The dictionary is broadcast once (ontology lexicons are MB-scale, like
  the reference's OBO files); the per-executor automaton is cached via
  the broadcast value identity.
* Matching is pure Python over tokens but batch-amortized; for very wide
  dictionaries swap in a real Aho–Corasick automaton — the operator
  contract (text → array<mention>) stays identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_MENTION_OUT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("surface", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)


def build_matcher(surfaces: list[str]) -> dict[str, list[tuple[tuple[str, ...], str]]]:
    """first-token → [(token_tuple, canonical_surface)], longest first.

    Greedy longest-match-first is the deterministic tie-break (the
    reference's MERGE-based loaders are first-writer-wins; we replace
    order-dependence with an explicit rule — SURVEY.md §7.5.2).
    """
    index: dict[str, list[tuple[tuple[str, ...], str]]] = {}
    for s in surfaces:
        toks = tuple(s.lower().split())
        if not toks:
            continue
        index.setdefault(toks[0], []).append((toks, " ".join(toks)))
    for head in index:
        index[head].sort(key=lambda p: len(p[0]), reverse=True)
    return index


def find_mentions(text: str, index: dict[str, list[tuple[tuple[str, ...], str]]]):
    """Greedy non-overlapping longest-match scan; yields (surface, start, end).

    start/end are token offsets (stable across whitespace normalization,
    which keeps the per-turn text-equality invariant decoupled from
    offsets).
    """
    # str.split() ≡ \S+ tokenization (splits on all unicode whitespace)
    # and is ~3× faster than regex iteration in the hot path
    toks = text.lower().split()
    out = []
    i, n = 0, len(toks)
    while i < n:
        cands = index.get(toks[i])
        matched = False
        if cands:
            for pat, canon in cands:
                L = len(pat)
                if i + L <= n and tuple(toks[i : i + L]) == pat:
                    out.append((canon, i, i + L))
                    i += L
                    matched = True
                    break
        if not matched:
            i += 1
    return out


class TokenAhoCorasick:
    """Token-level Aho–Corasick automaton with the SAME observable
    semantics as the greedy first-token matcher (leftmost position,
    longest match there, non-overlapping): one pass over the tokens
    collects, for every start offset, the longest pattern starting
    there; the greedy sweep then replays ``find_mentions``'s rule.

    Why it exists: the first-token index degrades when one head token
    fans out to thousands of patterns (10⁶-surface lexicons); the
    automaton's per-token work is O(1) amortized regardless of fan-out.
    Build cost is paid once per executor from the broadcast surface
    list, exactly like ``build_matcher``.
    """

    def __init__(self, surfaces: list[str]):
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.lengths: list[tuple[int, ...]] = [()]  # pattern lengths ending here
        for s in surfaces:
            toks = tuple(s.lower().split())
            if not toks:
                continue
            node = 0
            for t in toks:
                nxt = self.goto[node].get(t)
                if nxt is None:
                    self.goto.append({})
                    self.fail.append(0)
                    self.lengths.append(())
                    nxt = len(self.goto) - 1
                    self.goto[node][t] = nxt
                node = nxt
            if len(toks) not in self.lengths[node]:
                self.lengths[node] = self.lengths[node] + (len(toks),)
        # BFS fail links; propagate outputs from the fail target
        from collections import deque

        q = deque(self.goto[0].values())
        while q:
            node = q.popleft()
            for t, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and t not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(t, 0) if child != self.goto[f].get(t, 0) else 0
                self.lengths[child] = self.lengths[child] + self.lengths[self.fail[child]]

    def match_set(self, text: str) -> set[str]:
        """ALL distinct patterns occurring in ``text`` at token
        boundaries — independent per-pattern detection, NO greedy
        non-overlapping sweep. This is the contamination-probe contract:
        a probe must be counted even when it overlaps or nests inside
        another probe's occurrence (where ``find``'s segmentation would
        swallow it). One automaton pass per text regardless of probe
        count."""
        toks = text.lower().split()
        hits: set[str] = set()
        node = 0
        for j, t in enumerate(toks):
            while node and t not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(t, 0)
            for L in self.lengths[node]:
                hits.add(" ".join(toks[j - L + 1 : j + 1]))
        return hits

    def find(self, text: str):
        """Same output contract as ``find_mentions``."""
        toks = text.lower().split()
        best: dict[int, int] = {}  # start -> longest length
        node = 0
        for j, t in enumerate(toks):
            while node and t not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(t, 0)
            for L in self.lengths[node]:
                s = j - L + 1
                if L > best.get(s, 0):
                    best[s] = L
        out = []
        i, n = 0, len(toks)
        while i < n:
            L = best.get(i, 0)
            if L:
                out.append((" ".join(toks[i : i + L]), i, i + L))
                i += L
            else:
                i += 1
        return out


# surfaces above this count switch extract_mentions to the automaton
_AC_THRESHOLD = 5000


def extract_mentions(
    transcripts: DataFrame, surfaces: list[str], matcher: str = "auto"
) -> DataFrame:
    """transcripts → one row per detected mention (exploded).

    Output: (conv_id, turn_idx, role, surface, start, end). Linking to
    term_ids happens downstream as a broadcast join (operators.link) so
    the Python stage stays a pure text op.

    ``matcher``: "greedy" (first-token index — fastest for small
    lexicons), "aho" (token Aho–Corasick — wide lexicons), or "auto"
    (aho above 5k surfaces). Both produce identical mentions.
    """
    spark = transcripts.sparkSession
    bc = spark.sparkContext.broadcast(sorted(set(surfaces)))
    if matcher == "auto":
        matcher = "aho" if len(set(surfaces)) > _AC_THRESHOLD else "greedy"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if matcher == "aho":
            ac = TokenAhoCorasick(bc.value)
            find = ac.find
        else:
            index = build_matcher(bc.value)

            def find(text):
                return find_mentions(text, index)

        for pdf in batches:
            rows: dict[str, list] = {
                "conv_id": [],
                "turn_idx": [],
                "role": [],
                "surface": [],
                "start": [],
                "end": [],
            }
            for conv, tidx, role, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["role"], pdf["text"]
            ):
                if not isinstance(text, str) or not text:
                    continue
                for surface, s, e in find(text):
                    rows["conv_id"].append(conv)
                    rows["turn_idx"].append(int(tidx))
                    rows["role"].append(role)
                    rows["surface"].append(surface)
                    rows["start"].append(s)
                    rows["end"].append(e)
            yield pd.DataFrame(rows)

    cols = ["conv_id", "turn_idx", "role", "text"]
    return transcripts.select(*cols).mapInPandas(run, schema=_MENTION_OUT)


_LINKED_OUT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("term_id", T.StringType(), False),
        T.StructField("namespace", T.StringType(), True),
    ]
)


def extract_linked_mentions(
    transcripts: DataFrame,
    surface_map: dict[str, tuple[str, str]],
    canon_map: dict[str, str] | None = None,
    matcher: str = "auto",
) -> DataFrame:
    """Fused extract + link + canonical rewrite — one Arrow pass.

    Output: (conv_id, turn_idx, term_id, namespace), semantically equal
    to ``extract_mentions`` → ``link.link_mentions`` →
    ``canon.apply_canonical([term_id])`` but with the dimension lookup
    done inside the batch loop that already holds the matched surface
    string. The separate linking pass was the pipeline's worst scaler:
    two broadcast hash joins re-materializing every mention row cost
    ~24 CPU-s at 4 cores and 64+ CPU-s at 16 cores on 29M mentions
    (per-row memory traffic that inflates with parallelism, measured
    round 3); two dict lookups per mention here are free by comparison.
    The maps are dimension-scale — the same size class as the surface
    list the matcher broadcasts anyway — so the 100 TB posture is
    unchanged: one narrow map over the transcripts, zero shuffle.
    """
    spark = transcripts.sparkSession
    bc = spark.sparkContext.broadcast((surface_map, canon_map or {}))
    if matcher == "auto":
        matcher = "aho" if len(surface_map) > _AC_THRESHOLD else "greedy"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        smap, cmap = bc.value
        keys = sorted(smap)
        if matcher == "aho":
            ac = TokenAhoCorasick(keys)
            find = ac.find
        else:
            index = build_matcher(keys)

            def find(text):
                return find_mentions(text, index)

        for pdf in batches:
            rows: dict[str, list] = {
                "conv_id": [],
                "turn_idx": [],
                "term_id": [],
                "namespace": [],
            }
            for conv, tidx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                if not isinstance(text, str) or not text:
                    continue
                for surface, _s, _e in find(text):
                    tid, ns = smap[surface]
                    rows["conv_id"].append(conv)
                    rows["turn_idx"].append(int(tidx))
                    rows["term_id"].append(cmap.get(tid, tid))
                    rows["namespace"].append(ns)
            yield pd.DataFrame(rows)

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=_LINKED_OUT
    )


_GROUPED_OUT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("term_ids", T.ArrayType(T.StringType()), False),
        T.StructField("namespaces", T.ArrayType(T.StringType()), False),
    ]
)


def extract_linked_terms_grouped(
    transcripts: DataFrame,
    surface_map: dict[str, tuple[str, str]],
    canon_map: dict[str, str] | None = None,
    matcher: str = "auto",
) -> DataFrame:
    """Fused extract + link + canon, GROUPED per turn: one output row per
    input row with ≥1 mention, mentions as aligned parallel arrays
    (multiplicity preserved — exploding ``arrays_zip(term_ids,
    namespaces)`` reproduces ``extract_linked_mentions`` exactly, so
    observation-count provenance is unchanged).

    Why grouped: a transcript row IS one turn, so the per-turn term sets
    the co-occurrence family needs are complete inside the batch loop —
    keeping them grouped removes the ``groupBy(conv_id, turn_idx).
    collect_set`` exchange (a full shuffle of the mention table, the
    dominant post-fusion scaling loss measured round 3) from the
    pipeline; pair expansion happens in-row on ``array_distinct``.
    Contract: one input row per (conv_id, turn_idx) — the transcript
    input hint's shape; duplicate turn rows would produce per-row
    (not per-turn) co-occurrence sets downstream.
    """
    spark = transcripts.sparkSession
    bc = spark.sparkContext.broadcast((surface_map, canon_map or {}))
    if matcher == "auto":
        matcher = "aho" if len(surface_map) > _AC_THRESHOLD else "greedy"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        smap, cmap = bc.value
        keys = sorted(smap)
        if matcher == "aho":
            ac = TokenAhoCorasick(keys)
            find = ac.find
        else:
            index = build_matcher(keys)

            def find(text):
                return find_mentions(text, index)

        for pdf in batches:
            rows: dict[str, list] = {
                "conv_id": [],
                "turn_idx": [],
                "term_ids": [],
                "namespaces": [],
            }
            for conv, tidx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                if not isinstance(text, str) or not text:
                    continue
                tids: list[str] = []
                nss: list[str] = []
                for surface, _s, _e in find(text):
                    tid, ns = smap[surface]
                    tids.append(cmap.get(tid, tid))
                    nss.append(ns)
                if tids:
                    rows["conv_id"].append(conv)
                    rows["turn_idx"].append(int(tidx))
                    rows["term_ids"].append(tids)
                    rows["namespaces"].append(nss)
            # object dtype for the array columns: an EMPTY batch would
            # otherwise default them to float64, which Arrow cannot
            # convert to list<string>
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(rows["conv_id"], dtype="object"),
                    "turn_idx": pd.Series(rows["turn_idx"], dtype="int64"),
                    "term_ids": pd.Series(rows["term_ids"], dtype="object"),
                    "namespaces": pd.Series(rows["namespaces"], dtype="object"),
                }
            )

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=_GROUPED_OUT
    )


def hash_embedding(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 64,
    model: str | None = None,
    embedded_at: float | None = None,
) -> DataFrame:
    """Deterministic hash 'embedding' — the torch-free stand-in for the
    reference's BERT encode (``neo4j_pubmed_batch_embeddings_processor.py:
    382-452``): tokenizing + feature hashing + L2 normalize, as an
    Arrow-batched pandas UDF (Series → Series of array<float>).

    Empty text → zero vector (``neo4j_cancerkg_builder.py:151-152``).

    Per-vector provenance (E7): pass ``model`` (and optionally an epoch
    ``embedded_at``) to add ``embedding_model`` / ``embedded_at`` columns
    beside the vector — the reference stamps these during remediation
    (``pubmed_embedding_remediation.py:59-69``); recording them at write
    time makes the remediation pass unnecessary.
    """
    import zlib

    import numpy as np

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            v = np.zeros(dim, dtype=np.float32)
            if isinstance(t, str) and t:
                for tok in t.lower().split():
                    # crc32, not hash(): stable across executors/processes
                    h = zlib.crc32(tok.encode("utf-8")) & 0x7FFFFFFF
                    v[h % dim] += 1.0 if (h >> 16) & 1 else -1.0
                n = float(np.linalg.norm(v))
                if n > 0:
                    v /= n
            out.append(v.tolist())
        return pd.Series(out)

    out = df.withColumn("embedding", embed(F.col(text_col)))
    if model is not None:
        import time

        stamp = embedded_at if embedded_at is not None else time.time()
        out = out.withColumn("embedding_model", F.lit(model)).withColumn(
            "embedded_at", F.timestamp_seconds(F.lit(float(stamp)))
        )
    return out


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """Per-document top-k TF-IDF keywords — the classic salient-term
    extractor (the declarative replacement for the reference's
    driver-side keyword picks, ``readcube_publication_data_importer.py``
    tag fields): score(doc, t) = tf(doc, t) · log10(N/df(t)), keep the
    k highest-scoring terms per document.

    Determinism across engines and partitionings: the idf is scaled to
    an integer once per TERM (round(log10(N/df)·10⁶) as ``idf6``) and
    the score is the exact integer product ``tf·idf6`` — no float
    compare ever breaks a tie differently; residual score ties break
    toward the lexicographically smallest term.

    Scale shape: one (doc, term) count aggregate (map-side partial),
    the document-frequency table derived from it by a second vocab-
    sized aggregate, a 1-row corpus count broadcast, a size-gated join
    of the df table back onto the (doc, term) counts, then the top-k
    window — rank ≤ k is a WindowGroupLimit, so each partition keeps
    at most k rows per document before the window shuffle."""
    from .util import gated_broadcast
    from ..functions import text as tx

    # spread the single-split scan before the tokenize/explode
    toks = (
        docs.select(F.col(id_col), F.col(text_col))
        .repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select(F.col(id_col), F.explode(tx.tokens(text_col)).alias("tok"))
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    idf = dft.crossJoin(F.broadcast(n_docs)).select(
        "tok",
        F.round(F.log10(F.col("n") / F.col("df")) * 1_000_000, 0)
        .cast("long")
        .alias("idf6"),
    )
    scored = tf.join(gated_broadcast(idf, df_broadcast_threshold), "tok").select(
        id_col, "tok", "tf", (F.col("tf") * F.col("idf6")).alias("score6")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score6"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(id_col, "rank", "tok", "tf", "score6")
    )
