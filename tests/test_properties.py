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


# --- media codec properties (r3): lossless formats must round-trip any
# pixel content; decoders must never raise anything but their typed error
# on arbitrary bytes (the corrupt->error-row contract's foundation) ---

from engine.multimodal import (  # noqa: E402
    AudioDecodeError,
    ImageDecodeError,
    decode_bmp,
    decode_gif,
    decode_png,
    decode_pnm,
    decode_wav,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_wav,
)
from engine.jpeg import JpegError, decode_jpeg  # noqa: E402


@given(
    st.integers(1, 12),
    st.integers(1, 9),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(0, 2**32 - 1),
    st.integers(0, 4),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, channels, seed, ft):
    pix = bytes((seed + i * 31) % 256 for i in range(w * h * channels))
    assert decode_png(
        encode_png(w, h, channels, pix, filter_of_row=lambda r: (ft + r) % 5)
    ) == (w, h, channels, pix)


@given(st.integers(1, 12), st.integers(1, 9), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    pix = bytes((seed + i * 7) % 256 for i in range(w * h * 3))
    assert decode_bmp(encode_bmp(w, h, pix)) == (w, h, 3, pix)


@given(st.integers(1, 12), st.integers(1, 9), st.integers(1, 3),
       st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip_property(w, h, kbits, seed):
    n_colors = 1 << kbits
    pal = bytes((seed + i * 13) % 128 for i in range(3 * n_colors))
    ids = [(seed + i * i) % n_colors for i in range(w * h)]
    exp = b"".join(pal[i * 3 : i * 3 + 3] for i in ids)
    assert decode_gif(encode_gif(w, h, pal, ids)) == (w, h, 3, exp)


@given(st.integers(1, 200), st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(n, seed):
    samples = [((seed + i * 997) % 65536) - 32768 for i in range(n)]
    r, ch, m, ss = decode_wav(encode_wav(8000, 1, samples))
    assert (r, ch, m, ss) == (8000, 1, n, sum(s * s for s in samples))


@given(st.binary(max_size=512))
@settings(max_examples=300, deadline=None)
def test_decoders_raise_only_typed_errors_on_garbage(payload):
    """Arbitrary bytes (optionally prefixed with each format's magic) must
    produce the format's typed error or a decode — never struct.error,
    IndexError, zlib.error or friends leaking to the Spark stage."""
    for prefix, fn, err in (
        (b"\x89PNG\r\n\x1a\n", decode_png, ImageDecodeError),
        (b"BM", decode_bmp, ImageDecodeError),
        (b"GIF89a", decode_gif, ImageDecodeError),
        (b"\xff\xd8", decode_jpeg, JpegError),
        (b"RIFF\x00\x00\x00\x00WAVE", decode_wav, AudioDecodeError),
        (b"P6\n", decode_pnm, ImageDecodeError),
    ):
        try:
            fn(prefix + payload)
        except err:
            pass
