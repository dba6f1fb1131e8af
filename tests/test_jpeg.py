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
    # progressive marker (SOF2) rejected, not mis-decoded
    prog = bytearray(jp)
    sof0 = prog.find(b"\xff\xc0")
    prog[sof0 + 1] = 0xC2
    with pytest.raises(JpegError, match="non-baseline"):
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
