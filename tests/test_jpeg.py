"""Baseline JPEG decoder validation (engine/jpeg).

JPEG is lossy, so correctness is pinned without a reference decoder by
building bitstreams at the COEFFICIENT level (no forward DCT) and comparing
the decode against an INDEPENDENT textbook 2-D IDCT double sum — two
unrelated IDCT implementations agreeing pins the entropy/dequant/IDCT/
upsample/color pipeline. DC-only constructions are float-exact end to end
(the gate query's hash-pinnable subset)."""

from __future__ import annotations

import random

import pytest

from engine.jpeg import (
    ZIGZAG,
    JpegError,
    build_jpeg,
    decode_jpeg,
    idct_block_reference,
)


def _expected_gray(qtable, zigzag_block):
    coeffs = [0.0] * 64
    for i in range(64):
        coeffs[ZIGZAG[i]] = zigzag_block[i] * qtable[ZIGZAG[i]]
    return idct_block_reference(coeffs)


def test_dc_only_grayscale_is_exact():
    q = [8] * 64
    for dc, exp in ((16, 144), (-32, 96), (0, 128), (-96, 32)):
        blk = [dc] + [0] * 63
        w, h, c, px = decode_jpeg(build_jpeg(10, 6, q, [[blk, blk]]))
        assert (w, h, c) == (10, 6, 1)
        assert set(px) == {exp}


def test_random_coefficients_match_reference_idct():
    """40 random coefficient blocks: decoder (separable IDCT) must agree
    with the independent direct double-sum IDCT on every sample."""
    random.seed(3)
    for _ in range(40):
        q = [1 + random.randrange(4) for _ in range(64)]
        blk = [random.randrange(-20, 21) for _ in range(64)]
        w, h, c, px = decode_jpeg(build_jpeg(8, 8, q, [[blk]]))
        ref = _expected_gray(q, blk)
        assert max(abs(a - b) for a, b in zip(px, ref)) <= 1


def test_multi_block_dc_prediction_and_crop():
    """DC prediction chains across blocks; edge blocks crop to the true
    dimensions (12x10 = 2x2 MCUs of which only part is visible)."""
    q = [8] * 64
    dcs = [16, -32, 48, 0]
    blks = [[dc] + [0] * 63 for dc in dcs]
    w, h, c, px = decode_jpeg(build_jpeg(12, 10, q, [blks]))
    assert (w, h, c) == (12, 10, 1)
    vals = {(16, 144), (-32, 96), (48, 176), (0, 128)}
    # MCU layout: blocks 0,1 on the top row; 2,3 on the bottom row
    assert px[0] == 144  # block 0 (dc 16)
    assert px[8] == 96  # block 1 (dc -32) starts at x=8
    assert px[7 * 12] == 144  # last row of the top blocks
    assert px[8 * 12] == 176  # block 2 (dc 48) starts at y=8
    assert px[8 * 12 + 8] == 128  # block 3 (dc 0)
    assert set(px) <= {v for _, v in vals}


def test_color_420_flat_and_422():
    q = [8] * 64
    yb, cbb, crb = ([16] + [0] * 63, [8] + [0] * 63, [-8] + [0] * 63)
    w, h, c, px = decode_jpeg(
        build_jpeg(16, 16, q, [[list(yb)] * 4, [list(cbb)], [list(crb)]],
                   sampling=[(2, 2), (1, 1), (1, 1)])
    )
    assert (w, h, c) == (16, 16, 3)
    yv, cb, cr = 144, 136, 120
    exp = (
        round(yv + 1.402 * (cr - 128)),
        round(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        round(yv + 1.772 * (cb - 128)),
    )
    assert (set(px[0::3]), set(px[1::3]), set(px[2::3])) == tuple({e} for e in exp)
    # 4:2:2: luma 2x1
    w, h, c, px = decode_jpeg(
        build_jpeg(16, 8, q, [[list(yb)] * 2, [list(cbb)], [list(crb)]],
                   sampling=[(2, 1), (1, 1), (1, 1)])
    )
    assert (w, h, c) == (16, 8, 3)
    assert set(px[0::3]) == {exp[0]}


def test_corrupt_and_out_of_scope_rejected():
    q = [8] * 64
    jp = build_jpeg(8, 8, q, [[[16] + [0] * 63]])
    with pytest.raises(JpegError):
        decode_jpeg(jp[:8])
    with pytest.raises(JpegError):
        decode_jpeg(jp[: len(jp) // 2])
    with pytest.raises(JpegError, match="not a JPEG"):
        decode_jpeg(b"XX" + jp[2:])
    # a baseline stream relabeled SOF2 is spec-invalid (a progressive
    # scan carries either DC or one AC band, never Ss=0..Se=63) and must
    # fail loudly, not mis-decode
    prog = bytearray(jp)
    sof0 = prog.find(b"\xff\xc0")
    prog[sof0 + 1] = 0xC2
    with pytest.raises(JpegError, match="spectral"):
        decode_jpeg(bytes(prog))


def test_decode_images_dispatches_jpeg(spark):
    from engine.multimodal import decode_images

    jp = build_jpeg(10, 6, [8] * 64, [[[16] + [0] * 63] * 2])
    rows = spark.createDataFrame(
        [(1, jp), (2, jp[:8])], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in decode_images(rows).collect()}
    assert got[1]["status"] == "ok"
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (10, 6, 1)
    assert got[2]["status"].startswith("error:")


def test_malformed_segments_raise_jpeg_error_not_crashes():
    """Short/garbled segments must surface as JpegError (error rows), not
    struct.error/IndexError that would kill the Spark task."""
    bad = [
        b"\xff\xd8\xff\xc0\x00\x04\x08\x08",  # short SOF body
        b"\xff\xd8\xff\xdd\x00\x02",  # empty DRI
        b"\xff\xd8\xff\xda\x00\x02",  # empty SOS
        b"\xff\xd8\xff\xc0\x00\x08\x08\x00\x10\x00\x10\x03",  # SOF claims 3 comps, truncated
    ]
    for payload in bad:
        with pytest.raises(JpegError):
            decode_jpeg(payload)


def test_subsampled_luma_decodes_not_crashes():
    """Y=(1,1) with chroma=(2,2) is unusual but header-legal here; the
    interleave must index every plane at its own resolution."""
    q = [8] * 64
    yb, cbb, crb = ([16] + [0] * 63, [8] + [0] * 63, [-8] + [0] * 63)
    w, h, c, px = decode_jpeg(
        build_jpeg(16, 16, q, [[list(yb)], [list(cbb)] * 4, [list(crb)] * 4],
                   sampling=[(1, 1), (2, 2), (2, 2)])
    )
    assert (w, h, c) == (16, 16, 3)
    assert len(px) == 16 * 16 * 3


def test_restart_markers_reset_dc_prediction():
    """DRI + RSTn path (most camera/crawl JPEGs use restarts): DC
    predictors reset at each marker, entropy segments are byte-aligned,
    and decode matches the no-restart decode of the same coefficients."""
    q = [8] * 64
    dcs = [16, -32, 48, 0, 8, -8]  # 6 blocks -> 6x1 MCUs at 48x8
    blks = [[dc] + [0] * 63 for dc in dcs]
    plain = decode_jpeg(build_jpeg(48, 8, q, [[list(b) for b in blks]]))
    for interval in (1, 2, 3):
        rst = decode_jpeg(
            build_jpeg(48, 8, q, [[list(b) for b in blks]],
                       restart_interval=interval)
        )
        assert rst == plain, f"interval={interval}"


def test_restart_markers_with_ac_coefficients():
    import random

    random.seed(11)
    q = [1 + random.randrange(3) for _ in range(64)]
    blks = [[random.randrange(-15, 16) for _ in range(64)] for _ in range(8)]
    plain = decode_jpeg(build_jpeg(64, 8, q, [[list(b) for b in blks]]))
    rst = decode_jpeg(
        build_jpeg(64, 8, q, [[list(b) for b in blks]], restart_interval=2)
    )
    assert rst == plain


def test_standalone_markers_and_fill_bytes_before_sos():
    """ADVICE r3 #3: spec-valid standalone markers (TEM 0x01, stray RSTn)
    and 0xFF fill-byte padding before SOS carry no length word and must be
    skipped, not misparsed as length-prefixed segments."""
    q = [8] * 64
    blk = [16] + [0] * 63
    jp = build_jpeg(10, 6, q, [[list(blk), list(blk)]])
    plain = decode_jpeg(jp)
    # inject after SOI (2 bytes): fill bytes, TEM, a stray RST3
    inj = b"\xff\xff\xff" + b"\xff\x01" + b"\xff\xd3"
    assert decode_jpeg(jp[:2] + inj + jp[2:]) == plain
    # fill bytes directly before an existing marker (pad mid-stream)
    assert decode_jpeg(jp[:2] + b"\xff" + jp[2:]) == plain


# ---------------------------------------------------------------------------
# Progressive (SOF2) — r4. The progressive builder writes the SAME chosen
# coefficients through arbitrary scan scripts, so progressive decode must
# equal baseline decode EXACTLY (same coefficients -> same IDCT inputs).
# ---------------------------------------------------------------------------

from engine.jpeg import build_jpeg_progressive, default_progressive_scans  # noqa: E402


def _rand_blocks(n, lo=-20, hi=20, seed=0):
    rng = random.Random(seed)
    return [[rng.randrange(lo, hi + 1) for _ in range(64)] for _ in range(n)]


def test_progressive_equals_baseline_gray():
    for seed in range(6):
        q = [1 + seed % 4] * 32 + [2] * 32
        blks = _rand_blocks(6, seed=seed)
        b = decode_jpeg(build_jpeg(24, 16, q, [[list(x) for x in blks]]))
        p = decode_jpeg(build_jpeg_progressive(24, 16, q, [[list(x) for x in blks]]))
        assert b == p, f"seed {seed}"


def test_progressive_equals_baseline_color_420_and_oddsize():
    """4:2:0 color and non-multiple-of-8 dims: the non-interleaved AC block
    grid is SMALLER than the MCU-padded grid (padding blocks get no AC data)
    — the cropped pixels must still match baseline exactly."""
    random.seed(3)
    q = [1 + random.randrange(3) for _ in range(64)]
    yb = _rand_blocks(4, -10, 10, seed=31)
    cb, cr = _rand_blocks(1, -10, 10, seed=32), _rand_blocks(1, -10, 10, seed=33)
    for w, h in ((16, 16), (20, 12), (9, 11)):
        mx, my = (w + 15) // 16, (h + 15) // 16
        ybl = _rand_blocks(4 * mx * my, -10, 10, seed=w * h)
        cbl = _rand_blocks(mx * my, -10, 10, seed=w * h + 1)
        crl = _rand_blocks(mx * my, -10, 10, seed=w * h + 2)
        args = (w, h, q, [[list(x) for x in ybl], [list(x) for x in cbl],
                          [list(x) for x in crl]])
        kw = {"sampling": [(2, 2), (1, 1), (1, 1)]}
        assert decode_jpeg(build_jpeg(*args, **kw)) == decode_jpeg(
            build_jpeg_progressive(*args, **kw)
        ), (w, h)


def test_progressive_deep_successive_approximation():
    """Three-level successive approximation (Al=2 -> 1 -> 0) for both DC and
    AC: every refinement pass must land exactly back on the coefficients."""
    scans = [
        ([0], 0, 0, 0, 2),
        ([0], 1, 63, 0, 2),
        ([0], 0, 0, 2, 1),
        ([0], 1, 63, 2, 1),
        ([0], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
    ]
    for seed in range(4):
        q = [1] * 64
        blks = _rand_blocks(4, -30, 30, seed=100 + seed)
        b = decode_jpeg(build_jpeg(32, 8, q, [[list(x) for x in blks]]))
        p = decode_jpeg(
            build_jpeg_progressive(32, 8, q, [[list(x) for x in blks]], scans=scans)
        )
        assert b == p, f"seed {seed}"


def test_progressive_spectral_band_splits():
    """Multiple spectral bands (1-2 / 3-10 / 11-63) with refinement."""
    scans = [
        ([0], 0, 0, 0, 1),
        ([0], 1, 2, 0, 1),
        ([0], 3, 10, 0, 1),
        ([0], 11, 63, 0, 1),
        ([0], 0, 0, 1, 0),
        ([0], 11, 63, 1, 0),
        ([0], 1, 2, 1, 0),
        ([0], 3, 10, 1, 0),
    ]
    q = [2] * 64
    blks = _rand_blocks(6, seed=77)
    b = decode_jpeg(build_jpeg(48, 8, q, [[list(x) for x in blks]]))
    p = decode_jpeg(
        build_jpeg_progressive(48, 8, q, [[list(x) for x in blks]], scans=scans)
    )
    assert b == p


def test_progressive_restart_markers():
    q = [2] * 64
    blks = _rand_blocks(8, seed=55)
    plain = decode_jpeg(build_jpeg(64, 8, q, [[list(x) for x in blks]]))
    for interval in (2, 3):
        rst = decode_jpeg(
            build_jpeg_progressive(
                64, 8, q, [[list(x) for x in blks]], restart_interval=interval
            )
        )
        assert rst == plain, f"interval {interval}"


def test_progressive_truncation_and_garbage_are_errors():
    q = [8] * 64
    blks = _rand_blocks(4, seed=9)
    jp = build_jpeg_progressive(32, 8, q, [[list(x) for x in blks]])
    for cut in (len(jp) // 3, len(jp) // 2, len(jp) - 3):
        with pytest.raises(JpegError):
            decode_jpeg(jp[:cut])
    # scans without EOI
    with pytest.raises(JpegError):
        decode_jpeg(jp[:-2] + b"\x00\x00")


def test_progressive_per_component_dc_scans_on_subsampled():
    """Review r4 fix: a single-component DC scan is NON-interleaved over
    the component's own block grid even when the component is subsampled
    (spec A.2.2 — the shape custom libjpeg scan scripts emit). Pinned
    equal to baseline on 4:2:0 including non-multiple-of-16 dims; the
    libjpeg cross-check lives in tests/test_mediadec_jvm.py."""
    random.seed(21)
    q = [2] * 64
    scans = [([0], 0, 0, 0, 0), ([1], 0, 0, 0, 0), ([2], 0, 0, 0, 0),
             ([0], 1, 63, 0, 0), ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)]
    for w, h in ((32, 32), (20, 20), (24, 8)):
        mx, my = (w + 15) // 16, (h + 15) // 16
        yb = [[random.randrange(-12, 13) for _ in range(64)]
              for _ in range(4 * mx * my)]
        cb = [[random.randrange(-12, 13) for _ in range(64)] for _ in range(mx * my)]
        cr = [[random.randrange(-12, 13) for _ in range(64)] for _ in range(mx * my)]
        args = (w, h, q, [[list(x) for x in yb], [list(x) for x in cb],
                          [list(x) for x in cr]])
        kw = {"sampling": [(2, 2), (1, 1), (1, 1)]}
        assert decode_jpeg(build_jpeg(*args, **kw)) == decode_jpeg(
            build_jpeg_progressive(*args, scans=scans, **kw)
        ), (w, h)


def test_progressive_random_scan_scripts_property():
    """Property over RANDOM valid scan scripts: any spectral-band partition
    per component, any successive-approximation chain, DC scans either
    all-components-interleaved or per-component, gray or 4:2:0 color —
    progressive decode must equal baseline decode exactly."""
    rng = random.Random(99)

    def random_scans(ncomp):
        scans = []
        # DC: one interleaved scan, or one scan per component; Al chain
        al_chain = list(range(rng.randrange(3), -1, -1))  # e.g. [2,1,0]
        dc_groups = (
            [list(range(ncomp))]
            if rng.random() < 0.5
            else [[c] for c in range(ncomp)]
        )
        for gi, g in enumerate(dc_groups):
            scans.append((g, 0, 0, 0, al_chain[0]))
        for prev, cur in zip(al_chain, al_chain[1:]):
            for g in dc_groups:
                scans.append((g, 0, 0, prev, cur))
        # AC: per component, random band partition of 1..63, random Al chain
        for c in range(ncomp):
            cuts = sorted(rng.sample(range(2, 63), rng.randrange(0, 3)))
            bands = []
            lo = 1
            for cut in cuts + [63]:
                bands.append((lo, cut))
                lo = cut + 1
                if lo > 63:
                    break
            ac_chain = list(range(rng.randrange(2), -1, -1))
            rng.shuffle(bands)
            for lo_, hi in bands:
                scans.append(([c], lo_, hi, 0, ac_chain[0]))
            for prev, cur in zip(ac_chain, ac_chain[1:]):
                for lo_, hi in bands:
                    scans.append(([c], lo_, hi, prev, cur))
        return scans

    for trial in range(12):
        color = trial % 2 == 1
        w = 8 * rng.randrange(1, 4) + rng.randrange(8)
        h = 8 * rng.randrange(1, 4) + rng.randrange(8)
        q = [1 + rng.randrange(3) for _ in range(64)]
        if color:
            mx, my = (w + 15) // 16, (h + 15) // 16
            coeffs = [
                [[rng.randrange(-15, 16) for _ in range(64)]
                 for _ in range(4 * mx * my)],
                [[rng.randrange(-15, 16) for _ in range(64)] for _ in range(mx * my)],
                [[rng.randrange(-15, 16) for _ in range(64)] for _ in range(mx * my)],
            ]
            kw = {"sampling": [(2, 2), (1, 1), (1, 1)]}
        else:
            mx, my = (w + 7) // 8, (h + 7) // 8
            coeffs = [[[rng.randrange(-15, 16) for _ in range(64)]
                       for _ in range(mx * my)]]
            kw = {}
        scans = random_scans(len(coeffs))
        b = decode_jpeg(build_jpeg(w, h, q, [[list(x) for x in cc] for cc in coeffs], **kw))
        p = decode_jpeg(
            build_jpeg_progressive(
                w, h, q, [[list(x) for x in cc] for cc in coeffs],
                scans=scans, **kw,
            )
        )
        assert b == p, (trial, w, h, scans)
