"""Per-block language/script routing — analog of the reference's script
detection (``script_detection.py:64-104``).

Two-level routing, mirroring the reference's page-level short-circuit
(``detect_script_page``, ``script_detection.py:64-79``) followed by per-crop
detection (``detect_script``, ``script_detection.py:82-104``):

1. If the crawl-provided document ``lang`` tag is decisive, every block in the
   document is routed by it (SURVEY.md §4 O4 — trust coarse metadata, skip
   fine-grained work).
2. Otherwise (empty/unknown tag — the reference's ``auto`` mode) each block is
   classified by a codepoint-class histogram: Arabic-block letters vs Latin
   letters, majority wins, ties and letterless blocks default to ``ltr``.

Routes are ``'rtl'`` (Arabic-script normalization chain) and ``'ltr'``
(default chain). Histogram counts use compiled-regex subtraction
(``len(text) - len(class_removed)``) — C-speed, char-for-char identical to
the per-codepoint reference ``_ref_block_route`` (differential-tested).
"""

from __future__ import annotations

import re

RTL_DOC_LANGS = frozenset({"ar", "ur", "ara", "urd", "arabic", "urdu", "fa", "ps"})
LTR_DOC_LANGS = frozenset(
    {"en", "english", "de", "es", "fr", "it", "pt", "nl", "pl", "sv",
     "zh", "ja", "ko", "ru", "tr", "id", "vi", "th", "hi"}
)

# Arabic blocks per the reference: U+0600–U+06FF (script_detection.py:20-21),
# U+0750–U+077F and U+08A0–U+08FF (post_process.py:96-109).
_ARABIC_RANGES = ((0x0600, 0x06FF), (0x0750, 0x077F), (0x08A0, 0x08FF))
_ARABIC_RE = re.compile("[؀-ۿݐ-ݿࢠ-ࣿ]+")
_LATIN_RE = re.compile("[A-Za-z]+")


def _is_arabic(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _ARABIC_RANGES)


def doc_route(lang: str | None) -> str | None:
    """Document-level route from the crawl lang tag; None means 'auto'."""
    if not lang:
        return None
    tag = lang.strip().lower().split("-")[0]
    if tag in RTL_DOC_LANGS:
        return "rtl"
    if tag in LTR_DOC_LANGS:
        return "ltr"
    return None


def block_route(text: str) -> str:
    """Codepoint-histogram route for one block (the 'auto' path)."""
    n = len(text)
    n_arabic = n - len(_ARABIC_RE.sub("", text))
    n_latin = n - len(_LATIN_RE.sub("", text))
    return "rtl" if n_arabic > n_latin else "ltr"


def route_lang(text: str, doc_lang: str | None) -> str:
    """Route one block: decisive doc tag wins, else per-block histogram."""
    route = doc_route(doc_lang)
    if route is not None:
        return route
    return block_route(text)


# --- per-codepoint reference implementation (differential-test oracle) -----

def _ref_block_route(text: str) -> str:
    n_arabic = 0
    n_latin = 0
    for ch in text:
        if _is_arabic(ch):
            n_arabic += 1
        elif ("a" <= ch <= "z") or ("A" <= ch <= "Z"):
            n_latin += 1
    return "rtl" if n_arabic > n_latin else "ltr"
