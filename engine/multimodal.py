"""Multimodal (opaque binary) column plumbing.

Images/audio/video travel as opaque ``binary`` columns with typed metadata
(SURVEY training-data ops). The Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` signature, partition behavior — is real and tested;
the actual media decode is STUBBED: the decode libraries (PIL/ffmpeg/…) are
not in this container, so ``decode_image`` raises ``NotImplementedError``
unless PIL is importable, and the feature extractor uses a deterministic
fake (byte-derived dimensions) so outputs are reproducible and
oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, payload_sha string, "
    "fake_width bigint, fake_height bigint"
)

try:  # pragma: no cover - import gate for environments that have PIL
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image(payload: bytes):
    """Decode an image payload. STUB: requires PIL, absent in this sandbox."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this container ships without media "
            "libraries — the Spark plumbing around this stub is real"
        )
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def _binary_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = [len(p) if p is not None else 0 for p in payloads]
        shas = [
            hashlib.sha256(p if p is not None else b"").hexdigest() for p in payloads
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "payload_sha": shas,
                # deterministic fake "decoded" dimensions — stands in for the
                # real decode so batch shape/partitioning are exercised
                "fake_width": [n % 640 for n in n_bytes],
                "fake_height": [n % 480 for n in n_bytes],
            }
        )


def extract_binary_meta(df: DataFrame) -> DataFrame:
    """(doc_id, payload binary) -> typed metadata via Arrow batches."""
    return df.mapInPandas(_binary_meta_batches, schema=META_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, thumb binary, thumb_sha string"
)


def _resize_batches(target_w: int, target_h: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "width": [], "height": [],
                   "thumb": [], "thumb_sha": []}
            for p in pdf["payload"]:
                p = p or b""
                # STUB resize: a real impl decodes + PIL.resize; the fake is
                # deterministic byte downsampling so the batch shape, binary
                # output column, and partition behavior are all real.
                stride = max(1, len(p) // (target_w * target_h))
                thumb = p[::stride][: target_w * target_h]
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["thumb"].append(thumb)
                out["thumb_sha"].append(hashlib.sha256(thumb).hexdigest())
            yield pd.DataFrame(out)

    return fn


def resize_images(df: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """(doc_id, payload) -> deterministic fake thumbnails (decode stubbed)."""
    return df.mapInPandas(_resize_batches(target_w, target_h), schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx bigint, frame_sha string, n_bytes bigint"


def _frame_sample_batches(every_n: int, frame_bytes: int = 4096):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_sha": [], "n_bytes": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = p or b""
                # STUB frame-sample (1 row -> N frame rows): a real impl
                # demuxes video; the fake slices fixed-size "frames" and
                # keeps every `every_n`-th — exercising the explode-shaped
                # output a real frame sampler needs.
                n_frames = max(1, len(p) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    frame = p[i * frame_bytes : (i + 1) * frame_bytes]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_sha"].append(hashlib.sha256(frame).hexdigest())
                    rows["n_bytes"].append(len(frame))
            yield pd.DataFrame(rows)

    return fn


def sample_frames(
    df: DataFrame, every_n: int = 10, frame_bytes: int = 4096
) -> DataFrame:
    """(doc_id, payload) -> every-Nth fake frame rows (demux stubbed)."""
    return df.mapInPandas(
        _frame_sample_batches(every_n, frame_bytes), schema=FRAMES_SCHEMA
    )
