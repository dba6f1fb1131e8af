"""Pure-Python JPEG decoder (baseline SOF0 + progressive SOF2) + a
coefficient-level bitstream builder for its validation — no media library.

Decoder scope (covers the bulk of real crawl JPEGs): SOI/APPn/COM/DQT/DHT/
DRI/SOF0/SOF2/SOS marker walk, canonical Huffman entropy decoding with DC
prediction and restart markers, PROGRESSIVE scan accumulation (spectral
selection + successive approximation, r4 — a large share of real crawl
JPEGs are progressive), dequantization, zigzag ordering, 8x8 IDCT
(separable row/column), component planes with sampling factors 1 or 2
(4:4:4, 4:2:2, 4:2:0), nearest-neighbor chroma upsampling, JFIF YCbCr->RGB
with clamping, and edge-block cropping. Lossless/hierarchical frames,
arithmetic coding, and 12-bit depth raise JpegError (-> error rows through
the gate).

Validation strategy (tests/test_jpeg.py): JPEG is lossy, so instead of an
encode->decode pixel roundtrip the builders write bitstreams from CHOSEN
quantized coefficients (no forward DCT anywhere), and the expected pixels
come from an INDEPENDENT textbook 2-D IDCT double sum — two unrelated IDCT
implementations agreeing within +/-1 ulp-rounding validates the whole
entropy/dequant/IDCT/upsample/color pipeline without a reference decoder.
DC-only constructions are float-exact end to end, which is what the gate
queries hash-pin against their DuckDB oracles; progressive decode is
additionally pinned EXACTLY equal to baseline decode of the same
coefficients through arbitrary scan scripts (same coefficients -> same
IDCT inputs), and cross-checked against libjpeg via the JVM decode twin.
"""

from __future__ import annotations

import math
import struct

# local twin of engine.multimodal.ImageDecodeError to avoid a cycle; the
# multimodal dispatch re-raises through its own type
class JpegError(ValueError):
    """Malformed or out-of-scope JPEG payload."""


ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def idct_block(coeffs: list[float]) -> list[int]:
    """Separable 8x8 inverse DCT + level shift + clamp (natural order in,
    row-major samples out)."""
    # columns
    tmp = [0.0] * 64
    for x in range(8):
        col = [coeffs[v * 8 + x] for v in range(8)]
        for y in range(8):
            tmp[y * 8 + x] = sum(
                _C[v] * col[v] * _COS[v][y] for v in range(8)
            ) / 2
    out = [0] * 64
    for y in range(8):
        row = tmp[y * 8 : y * 8 + 8]
        for x in range(8):
            s = sum(_C[u] * row[u] * _COS[u][x] for u in range(8)) / 2
            v = int(round(s)) + 128
            out[y * 8 + x] = 0 if v < 0 else (255 if v > 255 else v)
    return out


def idct_block_reference(coeffs: list[float]) -> list[int]:
    """Independent textbook direct 2-D IDCT double sum (validation twin)."""
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    s += (
                        _C[u] * _C[v] * coeffs[v * 8 + u]
                        * _COS[u][x] * _COS[v][y]
                    )
            val = int(round(s / 4)) + 128
            out[y * 8 + x] = 0 if val < 0 else (255 if val > 255 else val)
    return out


# ---------------------------------------------------------------------------
# Huffman tables: simple uniform-length canonical tables (carried in the
# stream's DHT segments, so ANY spec decoder accepts them): 12 DC category
# symbols at 4 bits, 162 AC run/size symbols at 9 bits (all-ones codes
# unused — no marker emulation).
# ---------------------------------------------------------------------------

DC_SYMBOLS = list(range(12))
# EOBn symbols (r<<4, r=1..14) appended for progressive EOB runs — appending
# preserves the canonical codes of every pre-existing symbol, so baseline
# bitstreams are unchanged
AC_SYMBOLS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(1, 15)]
)


def _canonical(bits_per_symbol: int, symbols: list[int]):
    """(BITS counts list[16], symbols, symbol->(code,len) map)."""
    counts = [0] * 16
    counts[bits_per_symbol - 1] = len(symbols)
    codes = {}
    code = 0
    for i, sym in enumerate(symbols):
        codes[sym] = (code + i, bits_per_symbol)
    return counts, symbols, codes


DC_BITS, _, DC_CODES = _canonical(4, DC_SYMBOLS)
AC_BITS, _, AC_CODES = _canonical(9, AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _encode_coeff_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def build_jpeg(
    width: int,
    height: int,
    qtable: list[int],
    component_coeffs: list[list[list[int]]],
    sampling: list[tuple[int, int]] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Assemble a baseline JPEG from CHOSEN quantized coefficient blocks.

    ``component_coeffs[c]`` = list of 64-int zigzag-order quantized blocks
    for component c, in MCU scan order. 1 component = grayscale, 3 = YCbCr.
    ``sampling`` gives (h, v) factors per component (default all (1, 1));
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every N
    MCUs with DC-prediction resets (the path most camera/crawl JPEGs use).
    No forward DCT: what goes in is exactly what a decoder must recover
    before dequantization, which is what makes validation exact."""
    ncomp = len(component_coeffs)
    sampling = sampling or [(1, 1)] * ncomp
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0]) + bytes(qtable[ZIGZAG[i]] for i in range(64)))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        h, v = sampling[c]
        sof += bytes([c + 1, (h << 4) | v, 0])
    seg(0xC0, sof)
    for cls, (bits, syms) in ((0, (DC_BITS, DC_SYMBOLS)), (1, (AC_BITS, AC_SYMBOLS))):
        seg(0xC4, bytes([cls << 4]) + bytes(bits) + bytes(syms))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * ncomp
    n_blocks = [len(b) for b in component_coeffs]
    idx = [0] * ncomp
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    for mcu_i in range(mcus_x * mcus_y):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            bw.flush()
            out.extend(bw.out)
            bw = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + ((mcu_i // restart_interval - 1) % 8)]))
            preds = [0] * ncomp
        for c in range(ncomp):
            h, v = sampling[c]
            for _ in range(h * v):
                if idx[c] >= n_blocks[c]:
                    raise ValueError("not enough coefficient blocks")
                blk = component_coeffs[c][idx[c]]
                idx[c] += 1
                diff = blk[0] - preds[c]
                preds[c] = blk[0]
                s = _category(diff)
                code, ln = DC_CODES[s]
                bw.write(code, ln)
                if s:
                    bw.write(_encode_coeff_bits(diff, s), s)
                run = 0
                last_nz = 0
                for i in range(1, 64):
                    if blk[i]:
                        last_nz = i
                for i in range(1, last_nz + 1):
                    if blk[i] == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = AC_CODES[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _category(blk[i])
                    code, ln = AC_CODES[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(_encode_coeff_bits(blk[i], s), s)
                    run = 0
                if last_nz < 63:
                    code, ln = AC_CODES[0x00]
                    bw.write(code, ln)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise JpegError("truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise JpegError("truncated entropy stream")
                m = self.data[self.pos]
                self.pos += 1
                if m != 0x00:
                    raise JpegError("unexpected marker in entropy stream")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.n = 0


class _HuffTable:
    def __init__(self, bits: list[int], symbols: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                k += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("bad huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG. Returns (width, height, channels,
    pixel_bytes) — channels 1 (gray) or 3 (RGB). Every malformation —
    including short segments that would otherwise surface as
    struct.error/IndexError deep in the parser — raises JpegError, so the
    batch decode stage can keep its corrupt→error-row contract."""
    try:
        return _decode_jpeg_inner(payload)
    except JpegError:
        raise
    except (struct.error, IndexError, ValueError) as e:
        raise JpegError(f"malformed stream ({type(e).__name__})") from e


def _decode_jpeg_inner(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:2] != b"\xff\xd8":
        raise JpegError("unsupported: not a JPEG payload")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    coeff_store = None  # progressive: per-component full-grid blocks
    while True:
        if pos + 2 > len(payload):
            raise JpegError("truncated stream")
        if payload[pos] != 0xFF:
            raise JpegError("bad marker alignment")
        # Spec B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker code — skip them (ADVICE r3 #3)
        while payload[pos + 1] == 0xFF:
            pos += 1
            if pos + 2 > len(payload):
                raise JpegError("truncated stream")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            if coeff_store is not None:
                # progressive: all scans accumulated — dequant + IDCT now
                return _assemble_progressive(frame, coeff_store, qtables)
            raise JpegError("no scan before EOI")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn are standalone markers — no length word
            continue
        if pos + 2 > len(payload):
            raise JpegError("truncated stream")
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        if len(body) < ln - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:
            p = 0
            while p < len(body):
                prec_id = body[p]
                if prec_id >> 4 != 0:
                    raise JpegError("unsupported 16-bit quant table")
                zz = body[p + 1 : p + 65]
                if len(zz) < 64:
                    raise JpegError("truncated quant table")
                tbl = [0] * 64
                for i in range(64):
                    tbl[ZIGZAG[i]] = zz[i]
                qtables[prec_id & 0x0F] = tbl
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc_th = body[p]
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                syms = list(body[p + 17 : p + 17 + n])
                if len(syms) < n:
                    raise JpegError("truncated huffman table")
                huff[(tc_th >> 4, tc_th & 0x0F)] = _HuffTable(bits, syms)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                sh, sv = hv >> 4, hv & 0x0F
                if sh not in (1, 2) or sv not in (1, 2):
                    raise JpegError(f"unsupported sampling {sh}x{sv}")
                comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
            if w <= 0 or h <= 0:
                raise JpegError("non-positive dimensions")
            if nc not in (1, 3):
                raise JpegError(f"unsupported component count {nc}")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise JpegError("unsupported non-baseline frame (lossless/arith?)")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise JpegError("scan before frame header")
            ns = body[0]
            scan_sel = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan_sel.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se, ahl = body[1 + 2 * ns : 4 + 2 * ns]
            pos += ln
            if not frame.get("progressive"):
                return _decode_scan(
                    payload, pos, frame, scan_sel, qtables, huff, restart_interval
                )
            if coeff_store is None:
                coeff_store = _alloc_store(frame)
            pos = _decode_progressive_scan(
                payload,
                pos,
                frame,
                scan_sel,
                (ss, se, ahl >> 4, ahl & 0x0F),
                huff,
                restart_interval,
                coeff_store,
            )
            continue
        # APPn / COM / others: skip
        pos += ln


def _decode_scan(payload, pos, frame, scan_sel, qtables, huff, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w <= 0 or h <= 0:
        raise JpegError("non-positive dimensions")
    ncomp = len(comps)
    if ncomp not in (1, 3):
        raise JpegError(f"unsupported component count {ncomp}")
    if len(scan_sel) != ncomp:
        # a multi-scan (non-interleaved) baseline file would desync the MCU
        # loop below — reject loudly rather than decode garbage as ok
        raise JpegError("unsupported non-interleaved scan")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        bw = mcus_x * c["h"] * 8
        bh = mcus_y * c["v"] * 8
        planes.append(bytearray(bw * bh))
    sel_by_id = {cs: (td, ta) for cs, td, ta in scan_sel}
    br = _BitReader(payload[pos:])
    preds = [0] * ncomp
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # resync: discard pad bits/bytes and scan to the RSTn marker
                # (spec G.1.1 — padding before a marker is skipped)
                br.align()
                found = False
                while br.pos + 1 < len(br.data):
                    if (
                        br.data[br.pos] == 0xFF
                        and 0xD0 <= br.data[br.pos + 1] <= 0xD7
                    ):
                        br.pos += 2
                        found = True
                        break
                    br.pos += 1
                if not found:
                    raise JpegError("missing restart marker")
                preds = [0] * ncomp
            for ci, c in enumerate(comps):
                td, ta = sel_by_id.get(c["id"], (0, 0))
                dc_tbl = huff.get((0, td))
                ac_tbl = huff.get((1, ta))
                q = qtables.get(c["tq"])
                if dc_tbl is None or ac_tbl is None or q is None:
                    raise JpegError("missing table for scan")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = [0.0] * 64
                        s = dc_tbl.decode(br)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[ci] += diff
                        coeffs[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            sym = ac_tbl.decode(br)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise JpegError("AC coefficient overflow")
                            coeffs[ZIGZAG[k]] = (
                                _extend(br.read_bits(size), size) * q[ZIGZAG[k]]
                            )
                            k += 1
                        samples = idct_block(coeffs)
                        plane = planes[ci]
                        pw = mcus_x * c["h"] * 8
                        ox = (mx * c["h"] + bx) * 8
                        oy = (my * c["v"] + by) * 8
                        for yy in range(8):
                            row = samples[yy * 8 : yy * 8 + 8]
                            off = (oy + yy) * pw + ox
                            plane[off : off + 8] = bytes(row)
            mcu_count += 1
    return _planes_to_pixels(frame, planes, mcus_x, hmax, vmax)


def _planes_to_pixels(frame, planes, mcus_x, hmax, vmax):
    """Crop component planes to frame dims, upsample chroma (nearest
    neighbor), JFIF YCbCr->RGB with clamping — shared by the baseline
    streaming path and the progressive assembly."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    ncomp = len(comps)
    if ncomp == 1:
        c = comps[0]
        pw = mcus_x * c["h"] * 8
        out = bytearray()
        for y in range(h):
            out += planes[0][y * pw : y * pw + w]
        return w, h, 1, bytes(out)
    out = bytearray()
    pws = [mcus_x * c["h"] * 8 for c in comps]
    for y in range(h):
        for x in range(w):
            cx = [x * comps[i]["h"] // hmax for i in range(3)]
            cy = [y * comps[i]["v"] // vmax for i in range(3)]
            yy = planes[0][cy[0] * pws[0] + cx[0]]  # luma may be subsampled too
            cb = planes[1][cy[1] * pws[1] + cx[1]]
            cr = planes[2][cy[2] * pws[2] + cx[2]]
            r = yy + 1.402 * (cr - 128)
            g = yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
            b = yy + 1.772 * (cb - 128)
            for v in (r, g, b):
                iv = int(round(v))
                out.append(0 if iv < 0 else (255 if iv > 255 else iv))
    return w, h, 3, bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) — VERDICT r3 next-round #4. Scans accumulate quantized
# coefficients per block (spectral selection Ss..Se + successive
# approximation Ah/Al per spec G.1.2); dequant + IDCT happen once at EOI.
# The refinement algorithms mirror the spec's figures G.7/G.10 in their
# standard form (the same control flow libjpeg's public decoder documents):
# DC refinements OR in one bit per block; AC refinements interleave
# correction bits for already-nonzero coefficients with newly-significant
# ±(1<<Al) insertions and EOB runs. Validation: the progressive builder
# below writes the SAME chosen coefficients through arbitrary scan scripts,
# and decode must equal the baseline decode of those coefficients exactly
# (plus JVM libjpeg cross-checks in tests/test_mediadec_jvm.py).
# ---------------------------------------------------------------------------


def _comp_dims(frame, c):
    """((full-grid wb, hb), (non-interleaved wb, hb)) block dims of comp."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    full = (mcus_x * c["h"], mcus_y * c["v"])
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    nonint = ((cw + 7) // 8, (ch + 7) // 8)
    return full, nonint


def _alloc_store(frame):
    """Per-component full-grid coefficient blocks (natural order ints)."""
    store = []
    for c in frame["comps"]:
        (wb, hb), _ = _comp_dims(frame, c)
        store.append([[0] * 64 for _ in range(wb * hb)])
    return store


def _next_marker(payload, pos):
    """Scan forward from the end of entropy data to the next real marker
    (skipping pad bits/bytes, byte-stuffed FF00 and fill bytes)."""
    while pos + 1 < len(payload):
        if payload[pos] == 0xFF and payload[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    raise JpegError("truncated stream")


def _decode_progressive_scan(
    payload, pos, frame, scan_sel, spec, huff, restart_interval, store
):
    ss, se, ah, al = spec
    comps = frame["comps"]
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    sel = []
    for cs, td, ta in scan_sel:
        if cs not in by_id:
            raise JpegError("scan references unknown component")
        sel.append((by_id[cs], td, ta))
    if ss > se or se > 63 or al > 13:
        raise JpegError("bad spectral selection")
    if ss == 0 and se != 0:
        # progressive scans carry EITHER DC or an AC band, never both
        raise JpegError("bad spectral selection (DC scan must have Se=0)")
    if ss > 0 and len(sel) != 1:
        raise JpegError("AC scan must be non-interleaved")
    br = _BitReader(payload[pos:])
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)

    def restart(state):
        br.align()
        p = _next_marker(br.data, br.pos)
        if not (0xD0 <= br.data[p + 1] <= 0xD7):
            raise JpegError("missing restart marker")
        br.pos = p + 2
        state["preds"] = [0] * len(sel)
        state["eobrun"] = 0

    state = {"preds": [0] * len(sel), "eobrun": 0}

    if ss == 0:  # DC scan (interleaved over the scan's components)
        dc_tbls = []
        for ci, td, _ in sel:
            t = huff.get((0, td))
            if t is None and ah == 0:
                raise JpegError("missing table for scan")
            dc_tbls.append(t)
        if len(sel) > 1:
            units_x, units_y, interleaved = mcus_x, mcus_y, True
        else:
            # spec A.2.2: ANY single-component scan is non-interleaved over
            # the component's own block grid — including subsampled
            # components (review r4: the old h*v>1 test wrongly MCU-ordered
            # a lone subsampled-luma DC scan; libjpeg cross-check pins the
            # correct convention in tests/test_mediadec_jvm.py)
            _, (wb, hb) = _comp_dims(frame, comps[sel[0][0]])
            units_x, units_y, interleaved = wb, hb, False
        # hoist per-component constants out of the unit loop (review r4:
        # _comp_dims was recomputed per block)
        comp_meta = []
        for ci, _, _ in sel:
            c = comps[ci]
            (full_wb, _), _ = _comp_dims(frame, c)
            reps = (
                [(by, bx) for by in range(c["v"]) for bx in range(c["h"])]
                if interleaved
                else [(0, 0)]
            )
            comp_meta.append((c, full_wb, reps))
        unit = 0
        for uy in range(units_y):
            for ux in range(units_x):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart(state)
                unit += 1
                for si, (ci, td, _) in enumerate(sel):
                    c, full_wb, reps = comp_meta[si]
                    for by, bx in reps:
                        if interleaved:
                            brow, bcol = uy * c["v"] + by, ux * c["h"] + bx
                        else:
                            brow, bcol = uy, ux
                        blk = store[ci][brow * full_wb + bcol]
                        if ah == 0:
                            s = dc_tbls[si].decode(br)
                            diff = _extend(br.read_bits(s), s) if s else 0
                            state["preds"][si] += diff
                            blk[0] = state["preds"][si] * (1 << al)
                        else:  # refinement: one bit, OR into place
                            if br.read_bit():
                                blk[0] |= 1 << al
    else:  # AC scan: exactly one component, non-interleaved block order
        ci, _, ta = sel[0]
        c = comps[ci]
        ac_tbl = huff.get((1, ta))
        if ac_tbl is None:
            raise JpegError("missing table for scan")
        (full_wb, _), (wb, hb) = _comp_dims(frame, c)
        p1, m1 = 1 << al, -(1 << al)
        unit = 0
        for brow in range(hb):
            for bcol in range(wb):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart(state)
                unit += 1
                blk = store[ci][brow * full_wb + bcol]
                if ah == 0:  # first pass for this band
                    if state["eobrun"] > 0:
                        state["eobrun"] -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = ac_tbl.decode(br)
                        r, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if r != 15:
                                state["eobrun"] = (1 << r) - 1
                                if r:
                                    state["eobrun"] += br.read_bits(r)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > se:
                            raise JpegError("AC coefficient overflow")
                        v = _extend(br.read_bits(s), s)
                        blk[ZIGZAG[k]] = v * (1 << al)
                        k += 1
                else:  # refinement pass (spec G.1.2.3 / figure G.10)
                    k = ss
                    if state["eobrun"] == 0:
                        while k <= se:
                            sym = ac_tbl.decode(br)
                            r, s = sym >> 4, sym & 0x0F
                            if s == 0:
                                if r != 15:
                                    # NOTE: unlike the first-pass convention
                                    # ((1<<r)-1 ADDITIONAL blocks), refine
                                    # counts the CURRENT block too and
                                    # decrements after its correction sweep
                                    state["eobrun"] = 1 << r
                                    if r:
                                        state["eobrun"] += br.read_bits(r)
                                    break
                                val = 0  # ZRL: 16 zero-history coeffs
                            else:
                                if s != 1:
                                    raise JpegError("bad AC refinement size")
                                val = p1 if br.read_bit() else m1
                            while k <= se:
                                idx = ZIGZAG[k]
                                if blk[idx] != 0:
                                    if br.read_bit():
                                        if (blk[idx] & p1) == 0:
                                            blk[idx] += p1 if blk[idx] >= 0 else m1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                blk[ZIGZAG[k]] = val
                            k += 1
                    if state["eobrun"] > 0:
                        # history-correction bits for the rest of the band
                        while k <= se:
                            idx = ZIGZAG[k]
                            if blk[idx] != 0:
                                if br.read_bit():
                                    if (blk[idx] & p1) == 0:
                                        blk[idx] += p1 if blk[idx] >= 0 else m1
                            k += 1
                        state["eobrun"] -= 1
    br.align()
    return pos + _next_marker(br.data, br.pos)


def _assemble_progressive(frame, store, qtables):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    planes = []
    for ci, c in enumerate(comps):
        q = qtables.get(c["tq"])
        if q is None:
            raise JpegError("missing quant table")
        (wb, hb), _ = _comp_dims(frame, c)
        pw = wb * 8
        plane = bytearray(pw * hb * 8)
        for brow in range(hb):
            for bcol in range(wb):
                blk = store[ci][brow * wb + bcol]
                coeffs = [blk[i] * q[i] for i in range(64)]
                samples = idct_block(coeffs)
                for yy in range(8):
                    off = (brow * 8 + yy) * pw + bcol * 8
                    plane[off : off + 8] = bytes(samples[yy * 8 : yy * 8 + 8])
        planes.append(plane)
    return _planes_to_pixels(frame, planes, mcus_x, hmax, vmax)


# ---------------------------------------------------------------------------
# Progressive builder (validation twin of build_jpeg): writes CHOSEN
# quantized coefficients through an arbitrary scan script, so decode must
# recover exactly the same coefficients the baseline stream carries — the
# differential that pins the scan-accumulation logic without a reference
# decoder. Encoder refinement logic follows the spec's figure G.7 shape
# (EOB-run buffering with attached correction bits).
# ---------------------------------------------------------------------------


def default_progressive_scans(ncomp: int) -> list[tuple]:
    """A realistic scan script (the shape libjpeg emits by default for
    grayscale/color): DC first with one refinement, AC bands 1-5 and 6-63
    at Al=1, then full-band AC refinements to Al=0."""
    scans = [
        (list(range(ncomp)), 0, 0, 0, 1),  # DC, Al=1
    ]
    for c in range(ncomp):
        scans.append(([c], 1, 5, 0, 1))
        scans.append(([c], 6, 63, 0, 1))
    scans.append((list(range(ncomp)), 0, 0, 1, 0))  # DC refine
    for c in range(ncomp):
        scans.append(([c], 1, 5, 1, 0))
        scans.append(([c], 6, 63, 1, 0))
    return scans


class _ProgACWriter:
    """Per-scan AC entropy state: EOB-run accumulation with the correction
    bits that must ride along with the next emitted symbol."""

    def __init__(self, bw: _BitWriter):
        self.bw = bw
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits owed after next symbol

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = AC_CODES[nbits << 4]
            self.bw.write(code, ln)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
            for b in self.pending:
                self.bw.write(b, 1)
            self.pending = []


def build_jpeg_progressive(
    width: int,
    height: int,
    qtable: list[int],
    component_coeffs: list[list[list[int]]],
    sampling: list[tuple[int, int]] | None = None,
    scans: list[tuple] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Assemble a progressive (SOF2) JPEG from CHOSEN quantized coefficient
    blocks (same inputs as build_jpeg). ``scans`` is a list of
    (component_indices, Ss, Se, Ah, Al); default: a libjpeg-like script.
    Successive approximation uses arithmetic shifts for DC and
    sign-magnitude truncation for AC, per spec G.1.2."""
    ncomp = len(component_coeffs)
    sampling = sampling or [(1, 1)] * ncomp
    scans = scans or default_progressive_scans(ncomp)
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0]) + bytes(qtable[ZIGZAG[i]] for i in range(64)))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        h, v = sampling[c]
        sof += bytes([c + 1, (h << 4) | v, 0])
    seg(0xC2, sof)
    for cls, (bits, syms) in ((0, (DC_BITS, DC_SYMBOLS)), (1, (AC_BITS, AC_SYMBOLS))):
        seg(0xC4, bytes([cls << 4]) + bytes(bits) + bytes(syms))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    # MCU-order block lists -> full-grid [brow][bcol] arrays
    grids = []
    for c in range(ncomp):
        h, v = sampling[c]
        wb, hb = mcus_x * h, mcus_y * v
        grid = [[None] * wb for _ in range(hb)]
        i = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(v):
                    for bx in range(h):
                        if i >= len(component_coeffs[c]):
                            raise ValueError("not enough coefficient blocks")
                        grid[my * v + by][mx * h + bx] = component_coeffs[c][i]
                        i += 1
        grids.append(grid)

    def nonint_dims(c):
        h, v = sampling[c]
        cw = (width * h + hmax - 1) // hmax
        ch = (height * v + vmax - 1) // vmax
        return (cw + 7) // 8, (ch + 7) // 8

    for comp_ids, ss, se, ah, al in scans:
        sos = bytes([len(comp_ids)])
        for c in comp_ids:
            sos += bytes([c + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        bw = _BitWriter()

        def flush_restart(unit_idx, state):
            state["aw"].emit_eobrun()
            bw.flush()
            out.extend(bw.out)
            bw.out = bytearray()
            out.extend(
                bytes([0xFF, 0xD0 + ((unit_idx // restart_interval - 1) % 8)])
            )
            state["preds"] = [0] * len(comp_ids)

        state = {"preds": [0] * len(comp_ids), "aw": _ProgACWriter(bw)}

        if ss == 0:  # DC scan
            interleaved = len(comp_ids) > 1
            if interleaved:
                units = [(my, mx) for my in range(mcus_y) for mx in range(mcus_x)]
            else:
                wb, hb = nonint_dims(comp_ids[0])
                units = [(uy, ux) for uy in range(hb) for ux in range(wb)]
            for ui, (uy, ux) in enumerate(units):
                if restart_interval and ui and ui % restart_interval == 0:
                    flush_restart(ui, state)
                for si, c in enumerate(comp_ids):
                    h, v = sampling[c]
                    reps = (
                        [(by, bx) for by in range(v) for bx in range(h)]
                        if interleaved
                        else [(0, 0)]
                    )
                    for by, bx in reps:
                        brow = uy * v + by if interleaved else uy
                        bcol = ux * h + bx if interleaved else ux
                        blk = grids[c][brow][bcol]
                        if ah == 0:
                            dcv = blk[0] >> al  # arithmetic shift per G.1.2.1
                            diff = dcv - state["preds"][si]
                            state["preds"][si] = dcv
                            s = _category(diff)
                            code, ln = DC_CODES[s]
                            bw.write(code, ln)
                            if s:
                                bw.write(_encode_coeff_bits(diff, s), s)
                        else:
                            bw.write((blk[0] >> al) & 1, 1)
        else:  # AC scan: single component, non-interleaved
            if len(comp_ids) != 1:
                raise ValueError("AC scans must have exactly one component")
            c = comp_ids[0]
            wb, hb = nonint_dims(c)
            aw = state["aw"]
            ui = 0
            for brow in range(hb):
                for bcol in range(wb):
                    if restart_interval and ui and ui % restart_interval == 0:
                        flush_restart(ui, state)
                        aw.eobrun = 0
                        aw.pending = []
                    ui += 1
                    blk = grids[c][brow][bcol]
                    if ah == 0:  # first pass: RLE of coef>>Al (sign-magnitude)
                        run = 0
                        wrote = False
                        for k in range(ss, se + 1):
                            v = blk[k]
                            v = -((-v) >> al) if v < 0 else v >> al
                            if v == 0:
                                run += 1
                                continue
                            aw.emit_eobrun()
                            while run > 15:
                                code, ln = AC_CODES[0xF0]
                                bw.write(code, ln)
                                run -= 16
                            s = _category(v)
                            code, ln = AC_CODES[(run << 4) | s]
                            bw.write(code, ln)
                            bw.write(_encode_coeff_bits(v, s), s)
                            run = 0
                            wrote = True
                        if run > 0 or not wrote:
                            aw.eobrun += 1
                            if aw.eobrun == 0x7FFF:
                                aw.emit_eobrun()
                    else:  # refinement pass (figure G.7 / libjpeg shape)
                        absv = []
                        eobpos = -1
                        for k in range(ss, se + 1):
                            t = abs(blk[k]) >> al
                            absv.append(t)
                            if t == 1:
                                eobpos = k
                        run = 0
                        corr: list[int] = []
                        for k in range(ss, se + 1):
                            t = absv[k - ss]
                            if t == 0:
                                run += 1
                                continue
                            while run > 15 and k <= eobpos:
                                aw.emit_eobrun()
                                code, ln = AC_CODES[0xF0]
                                bw.write(code, ln)
                                run -= 16
                                for b in corr:
                                    bw.write(b, 1)
                                corr = []
                            if t > 1:
                                corr.append(t & 1)
                                continue
                            aw.emit_eobrun()
                            code, ln = AC_CODES[(run << 4) | 1]
                            bw.write(code, ln)
                            bw.write(0 if blk[k] < 0 else 1, 1)
                            for b in corr:
                                bw.write(b, 1)
                            corr = []
                            run = 0
                        if run > 0 or corr:
                            aw.eobrun += 1
                            aw.pending.extend(corr)
                            if aw.eobrun == 0x7FFF:
                                aw.emit_eobrun()
        state["aw"].emit_eobrun()
        bw.flush()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
