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
