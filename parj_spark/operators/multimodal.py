"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a struct of metadata.
Real codecs (PIL/librosa/av) are NOT in this container, so the decode step
is stubbed behind an import-try with a deterministic fake (md5-derived
dimensions) — the Spark-side plumbing (schema, Arrow batch shape,
partitioning, UDF signatures) is real and tested, which is the part that
matters at 100 TB: payload bytes never leave the JVM except through
column-pruned Arrow batches of the rows actually being decoded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # codec gate: real decoders when available
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _pil_decode(payload: bytes) -> tuple[int, int, str] | None:
    """Real image decode via PIL; None when the payload isn't a decodable
    image (caller falls back to the deterministic fake)."""
    import io

    try:
        from PIL import Image as _Image

        with _Image.open(io.BytesIO(payload)) as im:
            return int(im.width), int(im.height), str(im.mode)
    except Exception:
        return None

MEDIA_SCHEMA = "doc_id long, kind string, payload binary, n_bytes long, digest string"


def media_table(docs: DataFrame) -> DataFrame:
    """Extract the media spans of an interleaved-docs corpus into the
    multimodal table shape: (doc_id, pos, kind, media_ref, payload, n_bytes,
    digest). Payload is a deterministic fake derived from the media_ref
    (real systems resolve media:// refs against object storage); all
    derivation is JVM-side."""
    from pyspark.sql import functions as F

    spans = docs.select("doc_id", F.posexplode("spans").alias("pos", "sp")).filter(
        F.col("sp.kind") != "text"
    )
    payload = F.encode(F.concat(F.col("sp.media_ref"), F.lit("|"), F.col("sp.text")), "utf-8")
    return spans.select(
        "doc_id",
        "pos",
        F.col("sp.kind").alias("kind"),
        F.col("sp.media_ref").alias("media_ref"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


def attach_binary(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Demo media table: utf-8 payload bytes + metadata (JVM-side only)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("blob").alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


def _fake_dims(digest: str) -> tuple[int, int]:
    h = int(digest[:8], 16)
    return 64 + h % 1920, 64 + (h >> 8) % 1080


def decode_images(media: DataFrame, batch_hint: int = 1000, codec=None) -> DataFrame:
    """payload -> (doc_id, width, height, mode).

    Real decode when a codec is available (PIL by default, or an injected
    ``codec(payload) -> (w, h, mode) | None``); any payload the codec cannot
    decode — and every payload when no codec is installed — falls back to the
    deterministic md5-derived fake, so the operator never raises and the
    Arrow plumbing is identical on both branches."""
    id_type = dict(media.dtypes)["doc_id"]  # works for long or string ids
    schema = f"doc_id {id_type}, width int, height int, mode string"
    # resolve the branch driver-side so the closure captures the decision
    decode_fn = codec if codec is not None else (_pil_decode if HAVE_PIL else None)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            widths, heights, modes = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                real = decode_fn(raw) if decode_fn is not None else None
                if real is None:
                    w, h = _fake_dims(hashlib.md5(raw).hexdigest())
                    real = (w, h, "RGB")
                widths.append(real[0])
                heights.append(real[1])
                modes.append(real[2])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "mode": modes,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planner: computes target dims JVM-side from decoded metadata;
    the byte-level resample would run in the same mapInPandas slot as
    decode_images (stubbed with the codec)."""
    decoded = decode_images(media)
    scale = F.least(
        F.lit(1.0), F.lit(max_side) / F.greatest("width", "height")
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: deterministic fake frame
    count from the digest; emits one row per sampled frame index (the
    explode shape a real ffmpeg-backed decoder would produce)."""
    n_frames = (F.conv(F.substring("digest", 1, 6), 16, 10).cast("long") % 300 + 1).alias(
        "n_frames"
    )
    with_n = media.select("doc_id", n_frames)
    last = F.floor((F.col("n_frames") - 1) / every_n).cast("long")
    return with_n.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0).cast("long"), last)).alias("frame_idx"),
    ).withColumn("frame_idx", (F.col("frame_idx") * every_n).cast("long"))
