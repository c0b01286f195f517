"""Multimodal (image) columns: binary payloads with typed metadata.

The reference is text-only (its closest analogue is the binary-blob
abstract handling in ``neo4j_pubmed_batch_embeddings_processor.py``);
a training-data pipeline additionally carries images/audio/video as
opaque ``binary`` columns and needs decode → feature → dedup over
them. The Spark-side plumbing here is real — binary column in, Arrow-
batched ``mapInPandas``, typed schema out, then the SAME pigeonhole
banding machinery the text SimHash tiers use (``dedup.signature_*``).

The pixel DECODE is a deterministic stub: no image codec ships in
this container, so after genuinely parsing the PNG signature + IHDR
from the bytes, the 8×8 luminance grid a real decoder would produce
is synthesized as a pure function of the parsed header (a coarse
class pattern plus a fine-position flip). Swap ``_stub_pixels`` for a
``PIL.Image``/``cv2`` decode + grayscale resize on a real deployment;
everything downstream (mean threshold, bit packing, banding, verify)
is format-independent and stays as-is.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def synth_png_payload(doc_id: Column | str) -> Column:
    """A valid PNG signature + IHDR chunk as a binary column, built
    JVM-side (hex concat + to_binary + crc32; the CRC is the genuine
    PNG chunk CRC over type+data). Width/height are deterministic
    functions of the id, so an engine-independent oracle can recompute
    them. Shared by the decode and pHash queries."""
    c = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    width = (F.lit(64) + c % 192).cast("long")
    height = (F.lit(64) + (c * 7) % 128).cast("long")
    ihdr = F.concat(
        F.lpad(F.hex(width), 8, "0"),
        F.lpad(F.hex(height), 8, "0"),
        F.lit("0802000000"),  # bit depth 8, color type 2 (RGB), no interlace
    )
    crc = F.crc32(F.to_binary(F.concat(F.lit("49484452"), ihdr), F.lit("hex")))
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),  # PNG signature
        F.lit("0000000D"),  # IHDR length = 13
        F.lit("49484452"),  # 'IHDR'
        ihdr,
        F.lpad(F.hex(crc), 8, "0"),
    )
    return F.to_binary(png_hex, F.lit("hex"))


def _stub_pixels(w: int, h: int) -> list[int]:
    """Deterministic 8×8 luminance grid from the parsed header — the
    stand-in for a real decode+resize (see module docstring). A coarse
    (w//8, h//8) class sets the base bit pattern; one fine-position
    cell (w%8, h%8) is flipped, so images of the same class but
    different exact dimensions land within hamming 2 of each other —
    the near-duplicate structure a perceptual hash exists to find."""
    c0 = (w % 8) + 8 * (h % 8)
    base = (w // 8) * 31 + (h // 8) * 17
    return [
        200 * ((((base + c * 40503) % 97) % 2) ^ (1 if c == c0 else 0))
        for c in range(64)
    ]


def image_average_hash(
    images: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """64-bit average hash (aHash) per image: decode → 8×8 luminance
    grid → bit c = pixel_c > mean(grid) → signed-long packing (bit 64
    carries −2⁶³, same two's-complement convention as
    ``dedup.simhash64``, so the signature is one BIGINT on any engine).

    Scale shape: one Arrow-batched ``mapInPandas`` — a narrow map, no
    shuffle; payload bytes never leave the executor. Returns
    (id_col, width, height, phash)."""
    import pandas as pd  # noqa: PLC0415

    def ahash(batches):
        for pdf in batches:
            ids, ws, hs, sigs = [], [], [], []
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if b[:8] != PNG_SIG or b[12:16] != b"IHDR":
                    raise ValueError("payload is not a PNG IHDR header")
                w, h = struct.unpack(">II", b[16:24])
                px = _stub_pixels(w, h)
                mean = sum(px) / 64.0
                sig = 0
                for c, p in enumerate(px):
                    if p > mean:
                        sig |= 1 << c
                if sig >= 1 << 63:
                    sig -= 1 << 64  # two's-complement signed long
                ids.append(did)
                ws.append(w)
                hs.append(h)
                sigs.append(sig)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "phash": pd.Series(sigs, dtype="int64"),
                }
            )

    return images.select(id_col, payload_col).mapInPandas(
        ahash, schema=f"{id_col} long, width long, height long, phash long"
    )


def phash_near_pairs(
    images: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    max_bucket: int | None = 500,
) -> DataFrame:
    """Image near-duplicate pairs: hamming ≤ ``max_hamming`` on the
    64-bit aHash, via the SAME pigeonhole banding + hot-bucket cap +
    bit_count(xor) verify as the text tiers (``dedup.signature_near_
    pairs``) — dedup is one machinery across modalities; only the
    signature function is modality-specific."""
    from . import dedup

    sigs = image_average_hash(images, id_col, payload_col).select(id_col, "phash")
    return dedup.signature_near_pairs(
        sigs, id_col, "phash", max_hamming, 64, max_bucket
    )
