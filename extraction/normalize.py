"""Stage-2 "recognize": block text → canonical normalized text.

Analog of the reference's recognition + post-processing chain:

- RTL route ~ ``recognize_urdu`` + ``_clean_urdu_text``
  (``urdu_recognition_utrnet.py:132-166``, ``post_process.py:79-116``):
  (1) consecutive-duplicate collapse for Arabic-block letters
  (``post_process.py:90-95``), (2) keep-set character filter — Arabic blocks
  + whitespace + ZWNJ/ZWJ + a fixed punctuation set + ASCII digits
  (``post_process.py:99-112``), (3) whitespace collapse + strip
  (``post_process.py:115-116``).
- LTR route ~ ``recognize_english`` (``english_ocr_pipeline.py:52-84``):
  entities were already decoded during the parse; normalization is
  whitespace collapse + strip.

All per-codepoint operations run in Python, not JVM regex, so surrogate-pair
and ``\\s``-class semantics are pinned to one implementation (SURVEY.md §7.3
H2) — the Spark stage calls exactly these functions inside Arrow batches.
"""

from __future__ import annotations

_ARABIC_RANGES = ((0x0600, 0x06FF), (0x0750, 0x077F), (0x08A0, 0x08FF))

# Keep-set beyond Arabic letters (ref post_process.py:99-112): whitespace,
# ZWNJ/ZWJ, Urdu/Arabic + common punctuation, ASCII digits.
_RTL_KEEP_EXTRA = frozenset("‌‍،؛؟.۔!\"'()-–—:0123456789")


def _is_arabic_cp(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _ARABIC_RANGES)


def _rtl_keep(ch: str) -> bool:
    return _is_arabic_cp(ord(ch)) or ch.isspace() or ch in _RTL_KEEP_EXTRA


def collapse_ws(text: str) -> str:
    """Whitespace collapse + strip (ref post_process.py:115-116)."""
    return " ".join(text.split())


def dedup_arabic_runs(text: str) -> str:
    """Collapse runs of the *same Arabic-block letter* to one occurrence
    (ref post_process.py:90-95, the ``ااا → ا`` fix). Non-Arabic characters
    are untouched so Latin words keep their double letters."""
    out: list[str] = []
    prev = ""
    for ch in text:
        if ch == prev and _is_arabic_cp(ord(ch)):
            continue
        out.append(ch)
        prev = ch
    return "".join(out)


def normalize_rtl(text: str) -> str:
    # Order: keep-set FIRST, then duplicate-collapse, then whitespace.
    # (The reference runs dedup first, post_process.py:90-116; running the
    # keep-set first makes the chain idempotent — dropped characters can
    # join two identical Arabic letters into a run that a pre-filter dedup
    # would miss, e.g. 'ا;ا' → 'اا'. Idempotence means re-running stage 2
    # over already-normalized text is a no-op, which checkpoint resume
    # relies on. Property-tested in tests/test_properties.py.)
    kept = "".join(ch for ch in text if _rtl_keep(ch))
    deduped = dedup_arabic_runs(kept)
    return collapse_ws(deduped)


def normalize_ltr(text: str) -> str:
    return collapse_ws(text)


def normalize_text(text: str, route: str) -> str:
    """Normalize one block's text for its route ('rtl' | 'ltr')."""
    if route == "rtl":
        return normalize_rtl(text)
    return normalize_ltr(text)
