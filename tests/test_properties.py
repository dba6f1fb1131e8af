"""Property-based tests (hypothesis) for the extraction core invariants —
the determinism discipline the whole engine rests on (SURVEY.md §7.3 H1/H2/H4)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from extraction import extract_document, normalize_text, route_lang, segment_blocks
from extraction.segment import CHUNK_CHARS

# Text mixing ASCII, Arabic block, whitespace variants, ZWNJ/ZWJ, controls.
_texty = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0x0600, max_codepoint=0x06FF),
        st.sampled_from(" \t\n\r‌‍<>&\"'"),
    ),
    max_size=400,
)

_html_bytes = st.one_of(
    st.binary(max_size=2048),
    _texty.map(lambda t: f"<div><p>{t}</p><a href='x'>{t[:30]}</a></div>".encode()),
)

_langs = st.sampled_from(["en", "ur", "ar", "de", "zh", "", None, "xx"])


@given(_html_bytes, _langs)
@settings(max_examples=200, deadline=None)
def test_extract_never_raises_and_is_deterministic(html, lang):
    a = extract_document("u", html, lang)
    b = extract_document("u", html, lang)
    assert a == b
    assert a.status == "ok" or a.extracted_text == ""
    assert a.n_kept <= max(a.n_blocks, 0) or a.status.startswith("error")


@given(_html_bytes, _langs)
@settings(max_examples=200, deadline=None)
def test_span_invariants(html, lang):
    r = extract_document("u", html, lang)
    pos = 0
    for i, s in enumerate(r.spans):
        assert s.start == pos
        assert s.end > s.start  # empty-normalized blocks are dropped
        assert s.lang in ("rtl", "ltr")
        assert r.extracted_text[s.start : s.end] != ""
        pos = s.end + 1
    if r.spans:
        assert r.spans[-1].end == len(r.extracted_text)
        ids = [s.block_id for s in r.spans]
        assert ids == sorted(ids) and len(set(ids)) == len(ids)


@given(_texty, _langs)
@settings(max_examples=200, deadline=None)
def test_route_total_and_normalize_idempotent(text, lang):
    route = route_lang(text, lang)
    assert route in ("rtl", "ltr")
    once = normalize_text(text, route)
    twice = normalize_text(once, route)
    assert once == twice  # normalization is idempotent
    assert once == once.strip()
    assert "  " not in once


@given(_texty)
@settings(max_examples=300, deadline=None)
def test_fast_paths_match_reference_implementations(text):
    """The compiled-regex fast paths must be char-for-char identical to the
    per-codepoint reference implementations (H2 semantics pinning)."""
    from extraction.normalize import _ref_normalize_rtl, normalize_rtl
    from extraction.routing import _ref_block_route, block_route

    assert normalize_rtl(text) == _ref_normalize_rtl(text)
    assert block_route(text) == _ref_block_route(text)


@given(st.text(alphabet=st.sampled_from("ab "), min_size=0, max_size=1000))
@settings(max_examples=100, deadline=None)
def test_segment_blocks_order_and_bounds(body):
    blocks = segment_blocks(f"<p>{body}</p><div>{body}</div>")
    assert [b.block_id for b in blocks] == list(range(len(blocks)))
    for b in blocks:
        assert 0 < b.n_chars <= CHUNK_CHARS
        assert 0 <= b.n_link_chars <= b.n_chars
        assert b.text == " ".join(b.text.split())  # collapsed
