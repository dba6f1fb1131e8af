"""HTML byte decoding — the analog of the reference's image preprocessing
(``preprocess.py:210-238``: load → grayscale → denoise → threshold).

For web pages "preprocessing" means turning raw ``html: binary`` into a
unicode string deterministically: UTF-8 first, then a charset sniffed from a
``<meta charset=...>`` / ``<meta http-equiv=Content-Type>`` declaration in the
first 2 KiB, then latin-1 (which never fails). No wall-clock, no environment
dependence — the same bytes always decode to the same string.
"""

from __future__ import annotations

import codecs
import re

# Sniff only the document prologue, like charset detectors do.
_SNIFF_BYTES = 2048

_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""",
    re.IGNORECASE,
)

# Codec aliases seen in the wild, normalized to Python codec names.
_CODEC_ALIASES = {
    "utf8": "utf-8",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
    "us-ascii": "ascii",
}


def sniff_charset(data: bytes) -> str | None:
    """Return the declared charset from a meta tag in the prologue, or None."""
    m = _CHARSET_RE.search(data[:_SNIFF_BYTES])
    if not m:
        return None
    name = m.group(1).decode("ascii", "ignore").strip().lower()
    name = _CODEC_ALIASES.get(name, name)
    try:
        codecs.lookup(name)
    except LookupError:
        return None
    return name


def decode_html(data: bytes) -> str:
    """Decode raw page bytes to text.

    Order: (0) transparent gzip/zlib decompression when the payload starts
    with the gzip magic (WARC-style crawls often store per-record
    compressed bodies; a corrupt stream falls through to byte decoding of
    the raw payload, which the segmenter then treats as any other
    non-HTML noise — error-row discipline, never a raise); (1) strict
    UTF-8; (2) declared charset, strict; (3) latin-1 (total — every byte
    sequence decodes). Deterministic by construction.
    """
    if not data:
        return ""
    if data[:2] == b"\x1f\x8b":
        import gzip
        import zlib

        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error):
            # corrupt member: bad header raises BadGzipFile (an OSError),
            # but a VALID header over a corrupt deflate body raises
            # zlib.error — both fall through to raw-byte decoding
            pass
    try:
        return data.decode("utf-8")
    except UnicodeDecodeError:
        pass
    charset = sniff_charset(data)
    if charset is not None and charset not in ("utf-8",):
        try:
            return data.decode(charset)
        except (UnicodeDecodeError, LookupError):
            pass
    return data.decode("latin-1")
