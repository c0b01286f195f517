"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first (run in this order at scale):

1. **exact** — md5 fingerprint groupBy; one shuffle on a 16-byte key.
2. **MinHash + LSH** — shingle → K md5-min signatures → band buckets →
   candidate pairs only within a bucket; avoids the O(n²) cross join.
3. **SimHash** — sign-hash signature (16-bit sandbox default, 64-bit
   corpus scale: 2¹⁶ signature values cannot separate 10⁸⁺ documents —
   every band bucket saturates and the hot-bucket cap would silently
   drop everything; ``simhash64`` is the same arithmetic over 64 bits).
4. **n-gram Jaccard verify** — exact set overlap, run only on the
   candidate pairs the cheap tiers emit.

Hot-bucket caps are observable, not silent: ``minhash_cap_stats`` /
``simhash_cap_stats`` report, for the exact banding a pairing call
would use, how many buckets the cap drops, how many band rows those
buckets held, and how many documents lose EVERY band (and with it all
candidate generation) — the number that measures recall loss.

Everything is built-in-function only (JVM, codegen); md5 is used as the
hash family so a DuckDB oracle reproduces every value bit-for-bit.
The same duplicate-group resolution rule as the KG side applies:
min(doc_id) is the canonical representative (C3, SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(fingerprint, canonical_id, n_dups) — one row per distinct text."""
    return (
        docs.select(F.col(id_col), tx.fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig_0..sig_{K-1}) — sig_i = min over shingles of md5(i‖shingle).

    md5-hex strings compare lexicographically, which is a valid uniform
    min-hash family and is portable across engines.

    Shape: repartition the RAW docs (small rows — the exchange carries
    text once, not the ~3× larger shingle arrays the earlier
    formulation shuffled; small parquet inputs arrive as one split and
    this op is CPU-bound, so spread it — guide §2.3), then ONE
    Arrow-batched pass tokenizes, shingles, and min-hashes each doc.
    The per-shingle K md5 digests are cached per worker process, so a
    boilerplate shingle repeated across thousands of docs is hashed
    once (the JVM expression form re-hashed it every time — K
    interpreted md5+concat lambdas per shingle occurrence). hex-string
    min in Python is byte-lexicographic, identical to the JVM/DuckDB
    string compare on lowercase hex.
    """
    import pandas as pd

    spark = docs.sparkSession
    id_t = docs.schema[id_col].dataType.simpleString()
    k = int(num_hashes)
    n = int(shingle_n)

    def run(batches):
        import hashlib

        cache: dict[str, tuple] = {}
        prefixes = [f"{i}|".encode("utf-8") for i in range(k)]

        def digests(sh: str) -> tuple:
            d = cache.get(sh)
            if d is None:
                raw = sh.encode("utf-8")
                d = tuple(
                    hashlib.md5(p + raw).hexdigest() for p in prefixes
                )
                cache[sh] = d
            return d

        for pdf in batches:
            rows: list[tuple] = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = tx.py_tokens(text)
                if toks is None or len(toks) < n:
                    continue  # parity: word_shingles → [] → filtered
                shingles = {
                    " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
                }
                sigs = [digests(s) for s in shingles]
                rows.append(
                    (did, *[min(d[i] for d in sigs) for i in range(k)])
                )
            yield pd.DataFrame(
                rows, columns=[id_col, *[f"sig_{i}" for i in range(k)]]
            )

    schema = ", ".join(
        [f"{id_col} {id_t}", *[f"sig_{i} string" for i in range(k)]]
    )
    return (
        docs.select(id_col, text_col)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(run, schema=schema)
    )


def _minhash_bands(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    band_size: int,
    shingle_n: int,
) -> DataFrame:
    """(id, band_id, band_key) — one row per (doc, LSH band)."""
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n)
    return _bands_from_sigs(sigs, id_col, num_hashes, band_size)


def _bands_from_sigs(
    sigs: DataFrame, id_col: str, num_hashes: int, band_size: int
) -> DataFrame:
    """(id, band_id, band_key) from an existing signature frame — the
    banding used both when signatures are computed in-flight and when
    they come from a maintained store (:func:`dedup_delta`)."""
    n_bands = num_hashes // band_size
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "|", *[F.col(f"sig_{b * band_size + j}") for j in range(band_size)]
                        ).alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_key")


def _drop_hot_buckets(
    bands: DataFrame, bucket_cols: list[str], max_bucket: int
) -> DataFrame:
    """Anti-join away over-limit buckets. Over-limit bucket keys are few
    (they're the skew!) — aggregate to per-bucket counts, keep the heavy
    ones, and broadcast-anti-join them away. Unlike count-over-window
    this adds no sort, and the map-side partial count collapses hot
    buckets before the shuffle. The bands frame feeds the hot-key
    aggregate AND the join probe AND the l/r self-pairing — lazy
    localCheckpoint materializes the signatures once instead of
    recomputing them per consumer (exchange reuse only saves the
    shuffle, not the post-shuffle hash projection)."""
    bands = bands.localCheckpoint(eager=False)
    hot = (
        bands.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") > max_bucket)
        .select(*bucket_cols)
    )
    return bands.join(F.broadcast(hot), bucket_cols, "left_anti")


def _cap_stats(
    bands: DataFrame, bucket_cols: list[str], id_col: str, max_bucket: int
) -> DataFrame:
    """One row: (n_buckets, n_capped_buckets, n_rows_dropped,
    n_docs_fully_excluded) for the given banding and cap. The last
    number is the one that measures recall loss: a doc whose EVERY band
    is hot generates no candidates at all, so any true near-dup pair
    whose only agreeing band is hot is silently lost by the cap — this
    makes that loss observable (the repo's no-silent-caps rule).

    Scale shape: the same per-bucket aggregate the cap itself runs, one
    per-doc aggregate, and two single-row reductions joined on a
    literal key — no corpus-sized collect."""
    bands = bands.localCheckpoint(eager=False)
    counts = bands.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("_bn"))
    bucket_stats = counts.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("_bn") > max_bucket).cast("long")).alias("n_capped_buckets"),
        F.sum(F.when(F.col("_bn") > max_bucket, F.col("_bn")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_rows_dropped"),
    ).withColumn("_k", F.lit(1))
    hot = counts.filter(F.col("_bn") > max_bucket).select(*bucket_cols).withColumn(
        "_hot", F.lit(1)
    )
    per_doc = (
        bands.join(F.broadcast(hot), bucket_cols, "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_nb"),
            F.sum(F.coalesce("_hot", F.lit(0))).alias("_nh"),
        )
    )
    doc_stats = per_doc.agg(
        F.sum((F.col("_nb") == F.col("_nh")).cast("long")).alias(
            "n_docs_fully_excluded"
        )
    ).withColumn("_k", F.lit(1))
    return bucket_stats.join(doc_stats, "_k").drop("_k")


def minhash_cap_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    max_bucket: int = 500,
) -> DataFrame:
    """Hot-bucket drop report for ``minhash_lsh_pairs`` at the same
    parameters — run it beside the pairing call to see what the cap
    costs (see ``_cap_stats``)."""
    bands = _minhash_bands(docs, id_col, text_col, num_hashes, band_size, shingle_n)
    return _cap_stats(bands, ["band_id", "band_key"], id_col, max_bucket)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    max_bucket: int | None = 500,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing ≥1 LSH band.

    Scale shape: explode to (band_id, band_key, id), shuffle on the
    band key (short md5-concat string), self-pair within buckets. Hot
    buckets (boilerplate text) are the skew risk: ``max_bucket``
    (default 500 — ON by default; pass None to disable) drops buckets
    holding more than that many docs *before* pairing, bounding any
    bucket's pair output at max_bucket²/2 and killing the straggler
    task a boilerplate group would otherwise create. (Such groups are
    exact or near-exact duplicates — the cheap exact-dedup tier, run
    first, is the right tool for them, not pairwise LSH.) What the cap
    drops is observable via ``minhash_cap_stats`` at the same
    parameters — no silent caps.
    """
    bands = _minhash_bands(docs, id_col, text_col, num_hashes, band_size, shingle_n)
    if max_bucket is not None:
        bands = _drop_hot_buckets(bands, ["band_id", "band_key"], max_bucket)
    l = bands.alias("l")
    r = bands.alias("r")
    return (
        l.join(r, ["band_id", "band_key"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set overlap for candidate pairs.

    Returns integer (inter_size, union_size) — floats would make the
    cross-engine value comparison fragile; callers derive jaccard =
    inter/union.
    """
    spark = docs.sparkSession
    # repartition BEFORE the shingle projection: the exchange then
    # carries raw text (not the ~3× larger shingle arrays) and the
    # CPU-heavy shingling runs at full parallelism rather than inside
    # the single-split parquet scan task (guide §2.3 — shuffle fewer
    # bytes; the earlier order shuffled post-shingle rows)
    sh = (
        docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_tx"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select("_id", tx.word_shingles("_tx", shingle_n).alias("_sh"))
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter_size"),
            F.size(F.array_union("sh_a", "sh_b")).alias("union_size"),
        )
    )


def _simhash_map(docs: DataFrame, id_col: str, text_col: str, bits: int) -> DataFrame:
    """Shared Arrow-batched SimHash kernel (16- or 64-bit).

    Same values as the original in-row JVM formulation — bit sums are
    exact commutative integer arithmetic over the DISTINCT token set,
    so token order is irrelevant and the Python twin is provably
    equivalent given tokenization parity (``tx.py_tokens``) and md5
    parity (hashlib == Spark md5 == DuckDB md5 on UTF-8 bytes).

    Why Python: the JVM version evaluated ``bits``·|tokens| interpreted
    higher-order-function lambdas per document (~23 s for 50k docs at
    64 bits, single scan task); here each distinct token costs one dict
    hit (md5 masks are cached per worker — Zipf vocabularies hit the
    cache almost always) and each document one small vectorized
    reduction (guide §4.2: batch native code beats row-at-a-time JVM
    expressions). One round-robin repartition spreads the single-split
    parquet scan across cores (a testdata artifact — at scale the
    input arrives in many splits and the exchange coalesces away);
    everything after it is a narrow map with zero row amplification.
    """
    import numpy as np
    import pandas as pd

    spark = docs.sparkSession
    id_t = docs.schema[id_col].dataType.simpleString()
    nbits = int(bits)

    def run(batches):
        import hashlib

        cache: dict[str, object] = {}
        pow_ = 1 << np.arange(nbits, dtype=np.uint64)

        def mask(tok: str):
            b = cache.get(tok)
            if b is None:
                d = hashlib.md5(tok.encode("utf-8")).digest()
                byts = np.frombuffer(d, dtype=np.uint8)
                nib = np.empty(32, dtype=np.uint8)
                nib[0::2] = byts >> 4
                nib[1::2] = byts & 15
                if nbits == 16:
                    # bit p (0-based) = high bit of nibble p
                    b = ((nib[:16] >> 3) & 1).astype(np.int32)
                else:
                    # bit 2j   (0-based, even) = high bit of nibble j
                    # bit 2j+1 (0-based, odd)  = second bit of nibble j
                    b = np.empty(64, dtype=np.int32)
                    b[0::2] = (nib >> 3) & 1
                    b[1::2] = (nib >> 2) & 1
                cache[tok] = b
            return b

        for pdf in batches:
            ids, sigs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = tx.py_tokens(text)
                if toks is None:  # null text: F.size(null) filter drops it
                    continue
                st = set(toks)
                t_n = len(st)
                acc = np.zeros(nbits, dtype=np.int32)
                for t in st:
                    acc += mask(t)
                # sum_i = 2·(count of set bits) − T;  bit set iff > 0
                sig_bits = (2 * acc - t_n) > 0
                v = int((sig_bits.astype(np.uint64) * pow_).sum())
                if nbits == 64 and v >= 1 << 63:
                    v -= 1 << 64  # two's-complement signed long
                ids.append(did)
                sigs.append(v)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="object"),
                    "simhash": pd.Series(sigs, dtype="int64"),
                }
            )

    return (
        docs.select(id_col, text_col)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(run, schema=f"{id_col} {id_t}, simhash long")
    )


def simhash16(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash per document — a single narrow map, zero shuffle.

    bit_i = sign of Σ_tokens (±1), where the ±1 for token t at position
    i is the high bit of the i-th nibble of md5(t). Portable: the same
    arithmetic runs in the DuckDB oracle. Docs with no tokens are
    excluded (parity with the original exploded formulation).
    """
    return _simhash_map(docs, id_col, text_col, 16)


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash — the corpus-scale signature width (2¹⁶ signature
    values cannot separate 10⁸⁺ documents; 2⁶⁴ keeps band-bucket
    occupancy near one at any realistic corpus size).

    Bit mapping (portable — the DuckDB oracle reproduces it exactly):
    md5(token) has 32 hex nibbles; bit i (1-based, 1..64) reads nibble
    ⌈i/2⌉ and uses its HIGH bit (value ≥ 8) for odd i, its SECOND bit
    (value mod 8 ≥ 4) for even i — two independent uniform bits per
    nibble, 64 total. Signed-long packing: bit 64 carries weight
    −2⁶³ (two's complement), so the signature lands in one BIGINT on
    both engines without overflow; band extraction masks after an
    arithmetic shift, which is sign-safe, and xor/bit_count are
    bit-pattern ops, so nothing downstream cares about the sign.
    """
    return _simhash_map(docs, id_col, text_col, 64)


def signature_bands(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int,
    bits: int,
) -> DataFrame:
    """(id, <sig_col>, band_id, band_val): pigeonhole banding over ANY
    ``bits``-wide integer signature column — split the signature into
    ``max_hamming + 1`` disjoint bands; two signatures within the
    hamming bound must agree exactly on ≥1 band. Shared by the text
    SimHash tiers and the image pHash tier (multimodal.py) — one
    banding implementation, every signature family."""
    n_bands = max_hamming + 1
    widths: list[int] = []
    base, rem = divmod(bits, n_bands)
    for i in range(n_bands):
        widths.append(base + (1 if i < rem else 0))
    offs = 0
    band_structs = []
    for b, w in enumerate(widths):
        # arithmetic shiftright is sign-safe here: the mask keeps only
        # the low w bits of the shifted value, which are exactly the
        # signature's bits [offs, offs+w) regardless of sign extension
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright(sig_col, offs).bitwiseAND(F.lit((1 << w) - 1)).alias("band_val"),
            )
        )
        offs += w
    return sigs.select(
        id_col, sig_col, F.explode(F.array(*band_structs)).alias("band")
    ).select(id_col, sig_col, "band.band_id", "band.band_val")


def signature_near_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int,
    bits: int,
    max_bucket: int | None,
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming) over any integer signature
    frame via pigeonhole banding: candidates form only inside
    (band_id, band_val) buckets (one equi-join shuffle), hot buckets
    capped like every LSH tier here, ``bit_count(xor)`` exact verify."""
    bands = signature_bands(sigs, id_col, sig_col, max_hamming, bits)
    if max_bucket is not None:
        bands = _drop_hot_buckets(bands, ["band_id", "band_val"], max_bucket)
    l = bands.alias("l")
    r = bands.alias("r")
    ham = F.bit_count(
        F.col(f"l.{sig_col}").bitwiseXOR(F.col(f"r.{sig_col}"))
    )
    # hamming filter BEFORE the pair dedup: every duplicate row of a
    # pair carries the same signatures (hence the same hamming), so
    # filtering first changes nothing in the output while the dedup
    # exchange ships only surviving (id_a, id_b, hamming) rows — no
    # signature payload, fewer rows (guide §2.3)
    return (
        l.join(r, ["band_id", "band_val"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def _simhash_bands(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int,
    bits: int,
) -> DataFrame:
    """Text-SimHash banding: compute the ``bits``-wide signature, then
    ``signature_bands`` it."""
    if bits not in (16, 64):
        raise ValueError(f"simhash bits must be 16 or 64, got {bits}")
    sigs = (simhash16 if bits == 16 else simhash64)(docs, id_col, text_col)
    return signature_bands(sigs, id_col, "simhash", max_hamming, bits)


def simhash_cap_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 2,
    bits: int = 16,
    max_bucket: int = 500,
) -> DataFrame:
    """Hot-bucket drop report for ``simhash_near_pairs`` at the same
    parameters (see ``_cap_stats``). At corpus scale this is the
    saturation alarm for the 16-bit tier: when n_docs_fully_excluded
    approaches the corpus size, the signature space is saturated — use
    ``bits=64``."""
    bands = _simhash_bands(docs, id_col, text_col, max_hamming, bits)
    return _cap_stats(
        bands.drop("simhash"), ["band_id", "band_val"], id_col, max_bucket
    )


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 2,
    max_bucket: int | None = 500,
    bits: int = 16,
) -> DataFrame:
    """SimHash near-duplicate pairs: hamming distance ≤ ``max_hamming``
    on the ``bits``-wide signature, found WITHOUT an all-pairs
    comparison via pigeonhole banding — split the signature into
    ``max_hamming + 1`` disjoint bands; two signatures within the
    distance bound must agree exactly on at least one band, so
    candidates form only inside (band_id, band_value) buckets (one
    equi-join shuffle), then ``bit_count(xor)`` verifies exactly.
    Returns (id_a, id_b, hamming) with id_a < id_b.

    bits=16, max_hamming=2 → 3 bands of 6/5/5 bits (sandbox default);
    bits=64, max_hamming=3 → 4 bands of 16 bits (the corpus-scale
    configuration — a 16-bit space saturates at 10⁸⁺ docs and the cap
    would drop every bucket; see ``simhash64``). Same scale shape as
    the MinHash tier: bucketed candidates, exact verify, no cartesian —
    including the same hot-bucket cap (``max_bucket``, ON by default):
    template-heavy corpora concentrate thousands of near-identical docs
    into one band value, and the bucket self-join would go quadratic
    there; such groups are (near-)exact duplicates — the cheap
    exact-dedup tier's job, not pairwise search. What the cap drops is
    observable via ``simhash_cap_stats`` at the same parameters.
    """
    if bits not in (16, 64):
        raise ValueError(f"simhash bits must be 16 or 64, got {bits}")
    sigs = (simhash16 if bits == 16 else simhash64)(docs, id_col, text_col)
    return signature_near_pairs(sigs, id_col, "simhash", max_hamming, bits, max_bucket)


def dedup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard_pct: int = 50,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    max_bucket: int | None = 500,
    broadcast_threshold: int | None = 4_000_000,
) -> DataFrame:
    """Transitive near-duplicate CLUSTERS with a kept representative —
    the full dedup composition a corpus-curation pipeline actually
    runs: LSH candidate pairs → exact Jaccard verify → connected
    components over the verified pair graph (near-duplication is not
    transitive, so A≈B and B≈C put A,C in one cluster even when A,C
    themselves differ — the grouping every production dedup uses) →
    min-id representative per cluster.

    Returns one row per input document: (id, cluster_rep, is_rep).
    Keep-filtering the corpus is ``.filter("is_rep")``.

    ``min_jaccard_pct`` compares scaled INTEGERS (inter·100 ≥
    union·pct) — exact, no float threshold drift across engines.

    Scale shape: the pair tiers are bucketed/candidate-only (see module
    docstring); the component step runs on the PAIR graph (smaller than
    the corpus — only docs with a verified near-dup appear). The final
    assignment joins that mapping against the corpus ids — but on
    template-heavy web corpora the mapping is a large FRACTION of the
    corpus (every doc with a verified near-dup), so the broadcast hint
    is size-GATED (``broadcast_threshold`` rows, measured on the
    already-materialized mapping; None = never hint): under the gate
    it's a map-side join, above it AQE picks the strategy from runtime
    sizes — never a forced corpus-fraction broadcast.
    """
    from .canon import connected_components
    from .util import gated_broadcast

    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, num_hashes, band_size, shingle_n, max_bucket
    )
    verified = (
        jaccard_verify(docs, pairs, id_col, text_col, shingle_n)
        .filter(F.col("inter_size") * 100 >= F.col("union_size") * min_jaccard_pct)
        .select("id_a", "id_b")
    )
    mapping = connected_components(verified, src="id_a", dst="id_b")
    m = mapping.select(
        F.col("id").alias("_mid"), F.col("canonical_id").alias("_rep")
    )
    out = (
        docs.select(id_col)
        .join(
            gated_broadcast(m, broadcast_threshold),
            F.col(id_col) == F.col("_mid"),
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce("_rep", F.col(id_col)).alias("cluster_rep"),
        )
    )
    return out.withColumn("is_rep", F.col("cluster_rep") == F.col(id_col))


def _round_half_up_4(x: "object"):
    """Vectorized replica of Spark's ``round(double, 4)``: BigDecimal
    HALF_UP on the shortest decimal representation. The fast path works
    on the binary value (floor(|x|·10⁴ + 0.5), away from zero); values
    whose scaled form sits within 1e-6 of a .5 boundary — where
    binary-value rounding can disagree with decimal-string rounding —
    take the exact ``Decimal(repr(x))`` path, which matches
    ``BigDecimal.valueOf(double).setScale(4, HALF_UP)`` digit-for-digit
    (both operate on the shortest round-trip decimal form)."""
    import numpy as np

    s = x * 1e4
    near_half = np.abs(s - np.floor(s) - 0.5) < 1e-6
    out = np.sign(s) * np.floor(np.abs(s) + 0.5) / 1e4
    if near_half.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.0001")
        idx = np.nonzero(near_half)[0]
        for i in idx:
            out[i] = float(
                Decimal(repr(float(x[i]))).quantize(q, rounding=ROUND_HALF_UP)
            )
    return out


def embedding_near_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int | None = None,
    n_planes: int = 4,
    seed: int = 13,
) -> DataFrame:
    """Cosine near-dup pairs above threshold, sign-LSH bucketed.

    Scale shape (mirrors the MinHash→Jaccard tier): every vector hashes
    to a sign-LSH bucket (narrow map), candidate pairs form only inside
    a bucket — grouped by the bucket key (one shuffle on a short
    string; no BroadcastNestedLoopJoin / cartesian over the corpus) —
    then the exact cosine verifies each candidate. Approximate by
    construction: pairs in different buckets are never compared
    (recall rises with fewer planes / multiple tables; see
    ``embedding_near_duplicates_exact`` for the all-pairs verifier).

    Within-bucket scoring runs as ONE Arrow-batched ``applyInPandas``
    per bucket instead of a bucket-key self-join + per-pair interpreted
    JVM array folds: the earlier formulation shuffled every vector
    twice and evaluated three O(dim) ``F.aggregate`` lambdas per
    candidate pair (measured 277 s at sf1.0); here the pair loop is
    numpy over the bucket's vector block, chunked so the pair-product
    matrix stays bounded. Bit-for-bit equivalence with the JVM
    formulation is preserved deliberately: dot products and norms fold
    left-to-right in float64 (``np.cumsum`` — sequential by
    definition, unlike pairwise ``np.sum``/``np.dot``) and the 4-dp
    rounding replicates BigDecimal HALF_UP via :func:`_round_half_up_4`.

    ``dim`` defaults to the first row's vector size; a row whose vector
    size differs from ``dim`` raises at runtime — ``zip_with`` would
    otherwise null-pad the plane dot products and silently collapse
    every row into one bucket (degenerating the join back to all-pairs).
    """
    from . import vector

    if dim is None:
        first = embeddings.select(F.size(F.col(vec_col)).alias("_d")).first()
        if first is None:
            dim = 1  # empty input: any planes work, output is empty
        else:
            dim = int(first["_d"])
    planes = vector.hyperplanes(dim, n_planes, seed)
    bucketed = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.when(
            F.size(F.col(vec_col)) == dim, vector.sign_bucket(vec_col, planes)
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"embedding_near_duplicates: vector size != dim={dim}: "),
                    F.size(F.col(vec_col)).cast("string"),
                )
            )
        )
        .alias("_bkt"),
    )

    import numpy as np
    import pandas as pd

    id_t = embeddings.schema[id_col].dataType.simpleString()
    thr = float(threshold)
    pair_chunk = 1 << 16  # bounds the (chunk, dim) product matrix

    # prefilter margin: BLAS pairwise-summed dot vs the exact
    # left-to-right fold differ by ~dim·eps (≪1e-10); the rounding
    # boundary sits 5e-5 below the threshold; 2e-4 covers both with
    # orders of magnitude to spare, and false candidates only pay the
    # exact re-scoring below
    pre_thr = thr - 2e-4

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"cosine": "float64"}
            )
        ids = pdf["_id"].to_numpy()
        v = np.asarray(list(pdf["_v"]), dtype=np.float64)
        # left-to-right float64 norm fold, exactly the JVM aggregate
        nrm = np.sqrt(np.cumsum(v * v, axis=1)[:, -1])
        iu, ju = np.triu_indices(n, k=1)
        out_a, out_b, out_c = [], [], []
        for s in range(0, len(iu), pair_chunk):
            ii, jj = iu[s : s + pair_chunk], ju[s : s + pair_chunk]
            with np.errstate(divide="ignore", invalid="ignore"):
                # GEMM prefilter: one BLAS row-wise dot per chunk culls
                # pairs far below threshold before the exact (and ~10×
                # costlier) sequential fold + decimal rounding
                approx = np.einsum("ij,ij->i", v[ii], v[jj]) / (
                    nrm[ii] * nrm[jj]
                )
                cand = approx >= pre_thr
                if not cand.any():
                    continue
                ii, jj = ii[cand], jj[cand]
                dot = np.cumsum(v[ii] * v[jj], axis=1)[:, -1]
                # zero-norm rows yield NaN, exactly like the JVM 0/0;
                # NaN fails every >= comparison and is dropped below
                cos = _round_half_up_4(dot / (nrm[ii] * nrm[jj]))
            # strict id inequality mirrors the join filter id_a < id_b
            # (duplicate-id inputs must not emit self-pairs)
            keep = (cos >= thr) & (ids[ii] != ids[jj])
            if keep.any():
                ia, ib = ids[ii[keep]], ids[jj[keep]]
                swap = ia > ib
                out_a.append(np.where(swap, ib, ia))
                out_b.append(np.where(swap, ia, ib))
                out_c.append(cos[keep])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"cosine": "float64"}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    return bucketed.groupBy("_bkt").applyInPandas(
        score_bucket, schema=f"id_a {id_t}, id_b {id_t}, cosine double"
    )


def embedding_near_duplicates_exact(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All-pairs exact variant — O(n²), small inputs / recall
    measurement only; the production path is the bucketed function."""
    from . import vector

    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", F.round(vector.cosine("v_a", "v_b"), 4).alias("cosine")
    )
    return scored.filter(F.col("cosine") >= threshold)


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = r"\n\n",
    join_sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (the C4/CCNet
    boilerplate-removal pass): split every document on ``sep`` (a Java
    regex; default blank-line paragraphs), keep only the FIRST
    occurrence of each distinct paragraph across the whole corpus —
    first = smallest (``id_col``, position) — and reassemble each
    document from its surviving paragraphs in original order.
    Cookie banners, license headers and navigation chrome shared by
    thousands of pages survive exactly once, in the first document
    that carries them. Documents whose every paragraph was seen
    earlier disappear from the output.

    Returns (``id_col``, ``text_col``, n_kept) with paragraphs
    re-joined by ``join_sep``.

    Scale shape: two shuffles total. Candidate selection is a groupBy
    on ``md5(paragraph)`` whose ``min(struct(id, pos, paragraph))``
    aggregate combines MAP-SIDE, so a boilerplate paragraph repeated
    on 10⁷ pages contributes one row per input partition to the
    exchange, not 10⁷ — hot paragraphs (the very thing this operator
    exists for) cannot become hot shuffle keys. Reassembly never joins
    back to the corpus: the winning (id, pos, paragraph) rows ARE the
    output, one id-keyed shuffle away. The paragraph text crosses the
    wire once inside the min-struct; the 32-hex key replaces
    arbitrarily long paragraph keys.
    """
    parts = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_para"),
    ).filter(F.trim("_para") != "")
    # (_id, _pos) is unique, so _para never participates in the
    # ordering — it rides the struct to avoid a join back
    winners = parts.groupBy(F.md5(F.col("_para")).alias("_h")).agg(
        F.min(F.struct("_id", "_pos", "_para")).alias("_f")
    )
    return (
        winners.select(
            F.col("_f._id").alias(id_col),
            F.col("_f._pos").alias("_pos"),
            F.col("_f._para").alias("_para"),
        )
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                    lambda s: s["_para"],
                ),
                join_sep,
            ).alias(text_col),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )


def build_dedup_store(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """One maintained-store row per document: (id, fingerprint,
    sig_0..sig_{K-1}). ~300 bytes/doc — a billion-doc corpus keeps a
    ~300 GB store, shuffle-joinable and bucket-able by fingerprint,
    with no document text retained. Documents too short to shingle
    (< shingle_n tokens) carry NULL signatures and participate in the
    exact tier only. Append :func:`dedup_delta`'s unique survivors'
    rows after each batch to keep the store current.

    One Arrow-batched pass computes fingerprint AND signatures per doc
    (each reads the same text), replacing the earlier fingerprint-scan
    ⋈ signature-scan join — one id shuffle and one corpus scan fewer.
    ``py_fingerprint`` is the verified byte twin of ``tx.fingerprint``.
    """
    import pandas as pd

    spark = docs.sparkSession
    id_t = docs.schema[id_col].dataType.simpleString()
    k = int(num_hashes)
    n = int(shingle_n)

    def run(batches):
        import hashlib

        cache: dict[str, tuple] = {}
        prefixes = [f"{i}|".encode("utf-8") for i in range(k)]

        def digests(sh: str) -> tuple:
            d = cache.get(sh)
            if d is None:
                raw = sh.encode("utf-8")
                d = tuple(hashlib.md5(p + raw).hexdigest() for p in prefixes)
                cache[sh] = d
            return d

        for pdf in batches:
            rows: list[tuple] = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                fp = tx.py_fingerprint(text)
                toks = tx.py_tokens(text)
                if toks is None or len(toks) < n:
                    rows.append((did, fp, *([None] * k)))
                    continue
                shingles = {
                    " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
                }
                sigs = [digests(s) for s in shingles]
                rows.append(
                    (did, fp, *[min(d[i] for d in sigs) for i in range(k)])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "fingerprint", *[f"sig_{i}" for i in range(k)]],
            )

    schema = ", ".join(
        [f"{id_col} {id_t}", "fingerprint string",
         *[f"sig_{i} string" for i in range(k)]]
    )
    return (
        docs.select(id_col, text_col)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(run, schema=schema)
    )


def dedup_delta(
    new_docs: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    min_matching_hashes: int = 6,
    max_bucket: int = 500,
) -> DataFrame:
    """Dedup a NEW batch against the maintained corpus store WITHOUT
    rescanning the corpus — the per-snapshot shape a production
    pipeline actually runs (each crawl drop dedups against all prior
    drops; re-running the batch dedup over corpus+delta would be
    O(corpus) per drop). Returns one row per new document:
    (id, status ∈ {exact, near, unique}, dup_of) where ``dup_of`` is
    the smallest matching store id (NULL for unique).

    Tiers:
    * **exact** — fingerprint equi-join against the store (one shuffle
      on a 16-byte key; the store side is corpus-sized and is NEVER
      broadcast).
    * **near** — exact-tier survivors band-join the store's signature
      bands (same banding as the batch LSH; hot STORE buckets dropped
      at ``max_bucket``, the usual recall/blow-up trade), then
      near-dup is decided by SIGNATURE AGREEMENT: ≥
      ``min_matching_hashes`` of ``num_hashes`` minhash components
      equal. The store keeps no text, so the shingle-set verify of
      the batch path is unavailable by design; matching components
      estimate Jaccard as m/K (6/8 ≈ 0.75), the standard
      signature-store method. Deterministic: md5 minhashes are pure
      functions of the text.

    Batch-internal duplicates are out of scope by design — compose
    the existing batch operators over the delta first, then run the
    delta against the store.

    Scale shape: two key shuffles against the store (fingerprint,
    band key) + a bounded candidate join; nothing corpus-sized is
    ever broadcast, collected, or re-read as text.
    """
    old = "_store_id"
    nfp = new_docs.select(
        F.col(id_col), F.col(text_col), tx.fingerprint(text_col).alias("fingerprint")
    )
    exact = (
        nfp.join(
            store.select(F.col(id_col).alias(old), "fingerprint"), "fingerprint"
        )
        .groupBy(id_col)
        .agg(F.min(old).alias("_exact_of"))
    )
    survivors = nfp.join(exact, id_col, "left_anti")

    # lazy-materialize the survivor signatures: both the banding and
    # the agreement verify consume them, and without a barrier each
    # consumer would re-run the exact-tier anti join + signature pass
    # (delta-sized state — never corpus-sized)
    new_sigs = minhash_signatures(
        survivors, id_col, text_col, num_hashes, shingle_n
    ).localCheckpoint(eager=False)
    store_sigs = store.filter(F.col("sig_0").isNotNull()).select(
        F.col(id_col).alias(old), *[f"sig_{i}" for i in range(num_hashes)]
    )
    store_bands = _drop_hot_buckets(
        _bands_from_sigs(store_sigs, old, num_hashes, band_size),
        ["band_id", "band_key"],
        max_bucket,
    )
    new_bands = _bands_from_sigs(new_sigs, id_col, num_hashes, band_size)
    cand = (
        new_bands.join(store_bands, ["band_id", "band_key"])
        .select(id_col, old)
        .distinct()
    )
    o_sigs = store_sigs.select(
        old, *[F.col(f"sig_{i}").alias(f"_o_sig_{i}") for i in range(num_hashes)]
    )
    matches = sum(
        F.when(F.col(f"sig_{i}") == F.col(f"_o_sig_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    near = (
        cand.join(new_sigs, id_col)
        .join(o_sigs, old)
        .filter(matches >= int(min_matching_hashes))
        .groupBy(id_col)
        .agg(F.min(old).alias("_near_of"))
    )
    return (
        new_docs.select(id_col)
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(
            id_col,
            F.when(F.col("_exact_of").isNotNull(), F.lit("exact"))
            .when(F.col("_near_of").isNotNull(), F.lit("near"))
            .otherwise(F.lit("unique"))
            .alias("status"),
            F.coalesce("_exact_of", "_near_of").alias("dup_of"),
        )
    )
