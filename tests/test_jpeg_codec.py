"""Baseline-JPEG decoder tests (round 11 codec completion).

Three independent pins, so a mirrored encoder/decoder bug cannot hide:

1. HAND-ASSEMBLED files — DQT/DHT/SOF0/SOS and the entropy bits
   written out bit-by-bit in the test, with the expected pixels
   computed by hand (DC-only flat block) or by an INDEPENDENT
   textbook double-sum IDCT (single-AC block).
2. Round-trips through a self-contained test-side encoder (FDCT +
   quantize + canonical huffman, its own bit-writer and stuffing)
   with the error bound baseline JPEG actually guarantees at
   quant=1 (coefficient rounding only).
3. Honest gates: progressive/arithmetic/12-bit/CMYK name libjpeg.
"""

import struct

import numpy as np
import pytest

from goconnect_spark.operators.jpeg import ZIGZAG, decode_jpeg


# ---------------------------------------------------------------------
# test-side encoder (independent construction the decoder must invert)
# ---------------------------------------------------------------------

_CT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _CT[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _fdct(block):
    return _CT @ (block.astype(np.float64) - 128.0) @ _CT.T


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec
        return bytes(self.out)


def _fixed_table(symbols):
    """Canonical table with all `symbols` at one code length; returns
    (bits16, values, {symbol: (code, length)})."""
    n = len(symbols)
    length = max(1, (n + 1 - 1).bit_length())  # 2^length > n keeps all-1s free
    while (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    codes = {sym: (i, length) for i, sym in enumerate(symbols)}
    return bytes(bits), bytes(symbols), codes


def _category(v):
    return abs(v).bit_length()


def _encode_jpeg(planes, w, h, sampling, quant=1, restart=0, sof=0xC0):
    """planes: list of full-resolution uint8 arrays (1 or 3). sampling:
    list of (hi, vi). Chroma planes are box-averaged down before FDCT.
    Uses one shared quant table (flat `quant`) and per-image fixed-
    length huffman tables computed from the symbols actually used."""
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # component planes at their own resolution, edge-padded to the MCU grid
    comps = []
    for p, (hi, vi) in zip(planes, sampling):
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:  # box-average downsample
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            big = np.pad(p.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
            small = big.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        else:
            small = p.astype(np.float64)
        th, tw = mcuy * vi * 8, mcux * hi * 8
        sh, sw = small.shape
        small = np.pad(small, ((0, th - sh), (0, tw - sw)), mode="edge")
        comps.append(small)

    # collect blocks in scan order, computing symbols first
    def block_symbols(coefq, pred):
        dc = int(coefq[0, 0])
        diff = dc - pred
        syms_dc = _category(diff)
        zz = [int(coefq.flat[ZIGZAG[z]]) for z in range(64)]
        acs = []
        run = 0
        for z in range(1, 64):
            v = zz[z]
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))
                run -= 16
            s = _category(v)
            acs.append(((run << 4) | s, v, s))
            run = 0
        if run:
            acs.append((0x00, 0, 0))  # EOB
        return dc, syms_dc, diff, acs

    # first pass: quantized blocks + symbol sets
    all_units = []
    dc_syms, ac_syms = set(), set()
    preds = [0] * len(comps)
    n_units = mcux * mcuy if len(comps) > 1 else (
        (-(-w // 8)) * (-(-h // 8)))
    interleaved = len(comps) > 1
    unit_blocks = []
    for unit in range(n_units):
        if restart and unit and unit % restart == 0:
            preds = [0] * len(comps)
        blocks = []
        if interleaved:
            my, mx = unit // mcux, unit % mcux
            for ci, ((hi, vi), plane) in enumerate(zip(sampling, comps)):
                for v in range(vi):
                    for hh in range(hi):
                        y0, x0 = (my * vi + v) * 8, (mx * hi + hh) * 8
                        blk = plane[y0 : y0 + 8, x0 : x0 + 8]
                        coefq = np.round(_fdct(blk) / quant)
                        dc, sdc, diff, acs = block_symbols(coefq, preds[ci])
                        preds[ci] = dc
                        blocks.append((sdc, diff, acs))
                        dc_syms.add(sdc)
                        ac_syms.update(a[0] for a in acs)
        else:
            bx = -(-w // 8)
            y0, x0 = (unit // bx) * 8, (unit % bx) * 8
            blk = comps[0][y0 : y0 + 8, x0 : x0 + 8]
            coefq = np.round(_fdct(blk) / quant)
            dc, sdc, diff, acs = block_symbols(coefq, preds[0])
            preds[0] = dc
            blocks.append((sdc, diff, acs))
            dc_syms.add(sdc)
            ac_syms.update(a[0] for a in acs)
        unit_blocks.append(blocks)

    dc_bits, dc_vals, dc_codes = _fixed_table(sorted(dc_syms))
    ac_bits, ac_vals, ac_codes = _fixed_table(sorted(ac_syms))

    bw = _BitWriter()
    entropy = bytearray()
    for unit, blocks in enumerate(unit_blocks):
        if restart and unit and unit % restart == 0:
            entropy += bw.flush()
            entropy += bytes([0xFF, 0xD0 + ((unit // restart - 1) % 8)])
            bw = _BitWriter()
        for sdc, diff, acs in blocks:
            code, length = dc_codes[sdc]
            bw.put(code, length)
            if sdc:
                bw.put(diff if diff > 0 else diff + (1 << sdc) - 1, sdc)
            for sym, v, s in acs:
                code, length = ac_codes[sym]
                bw.put(code, length)
                if s:
                    bw.put(v if v > 0 else v + (1 << s) - 1, s)
    entropy += bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    qz = bytes([quant] * 64)  # flat table: zigzag order irrelevant
    out = b"\xff\xd8" + seg(0xDB, bytes([0]) + qz)
    out += seg(0xC4, bytes([0x00]) + dc_bits + dc_vals)
    out += seg(0xC4, bytes([0x10]) + ac_bits + ac_vals)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sof_body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for ci, (hi, vi) in enumerate(sampling):
        sof_body += bytes([ci + 1, (hi << 4) | vi, 0])
    out += seg(sof, sof_body)
    sos_body = bytes([len(comps)])
    for ci in range(len(comps)):
        sos_body += bytes([ci + 1, 0x00])
    sos_body += bytes([0, 63, 0])
    out += seg(0xDA, sos_body)
    return out + entropy + b"\xff\xd9"


def _pixels(n, seed=7):
    out, x = bytearray(), seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append(x % 256)
    return bytes(out)


# ---------------------------------------------------------------------
# 1. hand-assembled spec vectors
# ---------------------------------------------------------------------


def _hand_file(entropy_bits, q=16, dc_vals=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11),
               ac_spec=None):
    """8x8 gray baseline file written out by hand: flat quant table q,
    DC table = the 12 categories at length 4 (code i = value i),
    AC table = EOB and (0,2) at length 2 unless overridden."""
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    if ac_spec is None:
        ac_bits = [0] * 16
        ac_bits[1] = 2  # two codes of length 2: '00'->EOB, '01'->(0,2)
        ac_spec = (bytes(ac_bits), bytes([0x00, 0x02]))
    dc_bits = [0] * 16
    dc_bits[3] = 12
    out = b"\xff\xd8" + seg(0xDB, bytes([0]) + bytes([q] * 64))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + ac_spec[0] + ac_spec[1])
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bits = entropy_bits + "1" * ((8 - len(entropy_bits) % 8) % 8)
    out += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    return out + b"\xff\xd9"


def test_decode_jpeg_hand_vector_dc_only():
    """DC diff 5 under q=16: coefficient 80, IDCT of a DC-only block is
    80/8 = 10 everywhere, +128 level shift -> flat 138. Every byte of
    the file and of the expectation is written by hand."""
    # DC: category 3 = code '0011', magnitude bits '101'; then EOB '00'
    blob = _hand_file("0011" + "101" + "00")
    w, h, ch, depth, px = decode_jpeg(blob)
    assert (w, h, ch, depth) == (8, 8, 1, 8)
    assert px == bytes([138] * 64)


def test_decode_jpeg_hand_vector_single_ac_against_textbook_idct():
    """DC 0 then one AC at zigzag position 1 ((0,1) in natural order),
    value 3 under q=16 -> coefficient 48. Expected pixels computed
    with the T.81 §A.3.3 double-sum IDCT written directly from the
    spec formula — an independent code path from the decoder's
    separable matrix multiply."""
    # DC: category 0 = code '0000'; AC: code '01' = (run 0, size 2),
    # magnitude bits '11' = 3; EOB '00'
    blob = _hand_file("0000" + "01" + "11" + "00")
    w, h, ch, depth, px = decode_jpeg(blob)
    got = np.frombuffer(px, dtype=np.uint8).reshape(8, 8)

    coef = np.zeros((8, 8))
    coef[0, 1] = 3 * 16
    want = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * coef[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            want[x, y] = min(255, max(0, round(s / 4) + 128))
    assert np.array_equal(got, want.astype(np.uint8))


def test_decode_jpeg_hand_vector_zrl_and_negative():
    """ZRL (16 zeros) then a negative AC, exercising EXTEND on the
    low branch: AC table '00'->EOB, '01'->(0,1), plus ZRL at length 2.
    Value bits '0' with size 1 decode to -1 (T.81 F.2.2.1)."""
    ac_bits = [0] * 16
    ac_bits[1] = 3  # '00'->EOB, '01'->(0,1), '10'->ZRL
    blob = _hand_file("0000" + "10" + "01" + "0" + "00",
                      ac_spec=(bytes(ac_bits), bytes([0x00, 0x01, 0xF0])))
    w, h, ch, depth, px = decode_jpeg(blob)
    got = np.frombuffer(px, dtype=np.uint8).reshape(8, 8)
    coef = np.zeros(64)
    coef[ZIGZAG[17]] = -1 * 16  # 16 zeros skipped -> zigzag index 17
    want = np.clip(np.round(_CT.T @ coef.reshape(8, 8) @ _CT) + 128, 0, 255)
    assert np.array_equal(got, want.astype(np.uint8))


# ---------------------------------------------------------------------
# 2. encoder round-trips (quant=1: error is coefficient rounding only)
# ---------------------------------------------------------------------


def test_decode_jpeg_gray_roundtrip():
    w, h = 19, 13  # non-multiple of 8: edge blocks + crop
    img = np.frombuffer(_pixels(w * h, seed=3), dtype=np.uint8).reshape(h, w)
    blob = _encode_jpeg([img], w, h, [(1, 1)])
    got_w, got_h, ch, depth, px = decode_jpeg(blob)
    assert (got_w, got_h, ch, depth) == (w, h, 1, 8)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 3


def _rgb_to_ycbcr_planes(rgb):
    """JFIF forward transform (Rec. T.871 §7), the test's own copy."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)]


def _ycbcr_to_rgb(y, cb, cr):
    """JFIF inverse (the expectation side, written from the spec)."""
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([np.clip(np.round(c), 0, 255) for c in (r, g, b)], axis=-1)


def test_decode_jpeg_color_444_roundtrip():
    """In-gamut color (built from an RGB image, so nothing clips):
    decode must reproduce the RGB the encoder's YCbCr planes encode,
    up to DCT rounding amplified by the color transform."""
    w, h = 16, 8
    rgb = np.frombuffer(_pixels(w * h * 3, seed=5), dtype=np.uint8).reshape(h, w, 3)
    y, cb, cr = _rgb_to_ycbcr_planes(rgb)
    blob = _encode_jpeg([y, cb, cr], w, h, [(1, 1), (1, 1), (1, 1)])
    got_w, got_h, ch, depth, px = decode_jpeg(blob)
    assert (got_w, got_h, ch, depth) == (w, h, 3, 8)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    want = _ycbcr_to_rgb(y, cb, cr)
    assert np.max(np.abs(got - want)) <= 8  # |IDCT err| <= ~3, x1.772 + rounding


def test_decode_jpeg_color_420_flat_regions():
    """4:2:0 with color constant per 2x2 cell: box-average downsample
    == nearest upsample, so the only error is DCT rounding."""
    w, h = 16, 16
    small = np.frombuffer(_pixels(8 * 8 * 3, seed=11), dtype=np.uint8).reshape(8, 8, 3)
    rgb = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
    y, cb, cr = _rgb_to_ycbcr_planes(rgb)
    blob = _encode_jpeg([y, cb, cr], w, h, [(2, 2), (1, 1), (1, 1)])
    got_w, got_h, ch, _, px = decode_jpeg(blob)
    assert (got_w, got_h, ch) == (w, h, 3)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    want = _ycbcr_to_rgb(y, cb, cr)
    assert np.max(np.abs(got - want)) <= 8


def test_decode_jpeg_restart_markers_and_dri():
    w, h = 40, 8  # 5 MCUs; restart every 2 -> RST0 after MCU2, RST1 after 4
    img = np.frombuffer(_pixels(w * h, seed=21), dtype=np.uint8).reshape(h, w)
    blob = _encode_jpeg([img], w, h, [(1, 1)], restart=2)
    assert b"\xff\xd0" in blob  # the markers are really in the stream
    got_w, got_h, ch, _, px = decode_jpeg(blob)
    got = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 3


def test_decode_jpeg_sof1_extended_sequential():
    w, h = 8, 8
    img = np.frombuffer(_pixels(w * h, seed=31), dtype=np.uint8).reshape(h, w)
    blob = _encode_jpeg([img], w, h, [(1, 1)], sof=0xC1)
    got = np.frombuffer(decode_jpeg(blob)[4], dtype=np.uint8).reshape(h, w)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 3


def test_decode_jpeg_byte_stuffing_present():
    """A flat-white image produces large coefficients whose entropy
    bytes include 0xFF (padding guarantees at least the tail) — pin
    that a stream containing stuffed bytes still round-trips."""
    img = np.full((8, 8), 255, dtype=np.uint8)
    blob = _encode_jpeg([img], 8, 8, [(1, 1)])
    got = np.frombuffer(decode_jpeg(blob)[4], dtype=np.uint8).reshape(8, 8)
    assert np.max(np.abs(got.astype(int) - 255)) <= 2


def test_decode_jpeg_quant_table_applies():
    """q=8: a mid-gray-plus-step image must still decode within the
    quantization error bound q/2 per coefficient (~q here)."""
    img = np.frombuffer(_pixels(64, seed=41), dtype=np.uint8).reshape(8, 8)
    blob = _encode_jpeg([img], 8, 8, [(1, 1)], quant=8)
    got = np.frombuffer(decode_jpeg(blob)[4], dtype=np.uint8).reshape(8, 8)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 8 * 2


# ---------------------------------------------------------------------
# 3. honest gates + malformed input contract
# ---------------------------------------------------------------------


def test_decode_jpeg_gates_name_libjpeg():
    img = np.zeros((8, 8), dtype=np.uint8)
    base = _encode_jpeg([img], 8, 8, [(1, 1)])
    # progressive (SOF2) now DECODES — a sequential stream relabeled
    # SOF2 is a valid one-scan progressive file (Ss=0 Se=63 Ah=Al=0)
    prog = base.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg(prog) == decode_jpeg(base)
    arith = base.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError, match="libjpeg"):
        decode_jpeg(arith)
    lossless = base.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(NotImplementedError, match="libjpeg"):
        decode_jpeg(lossless)
    # 12-bit precision
    i = base.index(b"\xff\xc0")
    twelve = base[: i + 4] + bytes([12]) + base[i + 5 :]
    with pytest.raises(NotImplementedError, match="libjpeg"):
        decode_jpeg(twelve)


def test_decode_jpeg_malformed_raises_valueerror():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 jpeg-ish garbage")
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(None)
    # SOS before SOF
    img = np.zeros((8, 8), dtype=np.uint8)
    blob = _encode_jpeg([img], 8, 8, [(1, 1)])
    i = blob.index(b"\xff\xc0")
    seglen = (blob[i + 2] << 8) | blob[i + 3]
    no_sof = blob[:i] + blob[i + 2 + seglen :]
    with pytest.raises(ValueError):
        decode_jpeg(no_sof)


# ---------------------------------------------------------------------
# Progressive JPEG (T.81 Annex G): test-side progressive encoder
# (spectral selection + successive approximation, EOB runs, correction
# bits) — an independent construction whose scans must reassemble to
# EXACTLY the coefficients of the equivalent baseline file.
# ---------------------------------------------------------------------


def _quantized_block_grids(planes, w, h, sampling, quant):
    """Per-component PADDED block grids of zigzag-order quantized
    coefficient lists (the same FDCT/quant pipeline as _encode_jpeg,
    so a baseline file built from the same inputs carries identical
    coefficients)."""
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    grids = []
    for p, (hi, vi) in zip(planes, sampling):
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            big = np.pad(p.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
            small = big.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        else:
            small = p.astype(np.float64)
        th, tw = mcuy * vi * 8, mcux * hi * 8
        sh, sw = small.shape
        small = np.pad(small, ((0, th - sh), (0, tw - sw)), mode="edge")
        grid = []
        for gy in range(mcuy * vi):
            row = []
            for gx in range(mcux * hi):
                blk = small[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8]
                coefq = np.round(_fdct(blk) / quant).astype(int)
                row.append([int(coefq.flat[ZIGZAG[z]]) for z in range(64)])
            grid.append(row)
        grids.append(grid)
    return grids, mcux, mcuy


class _ProgScanWriter:
    """One scan's entropy stream with deferred EOB runs + buffered
    correction bits (the T.81 §G.1.2 encoder side)."""

    def __init__(self, codes):
        self.bw = _BitWriter()
        self.codes = codes  # {symbol: (code, length)}
        self.eobrun = 0
        self.pending_bits = []

    def sym(self, s):
        code, length = self.codes[s]
        self.bw.put(code, length)

    def flush_eobrun(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.bw.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending_bits:
            self.bw.put(b, 1)
        self.pending_bits = []


def _encode_jpeg_progressive(planes, w, h, sampling, scans, quant=1,
                             ac_restart=0):
    """Emit a progressive JPEG. `scans` is a list of scan specs:
      ("dc_first", al) / ("dc_refine", al)            — interleaved
      ("ac_first", comp, ss, se, al)                  — per component
      ("ac_refine", comp, ss, se, al)                 — ah is al+1
    `ac_restart` puts a DRI/RSTn cadence on AC scans (block units)."""
    grids, mcux, mcuy = _quantized_block_grids(planes, w, h, sampling, quant)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    out = b"\xff\xd8" + seg(0xDB, bytes([0]) + bytes([quant] * 64))
    if ac_restart:
        out += seg(0xDD, struct.pack(">H", ac_restart))
    sof_body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci, (hi, vi) in enumerate(sampling):
        sof_body += bytes([ci + 1, (hi << 4) | vi, 0])
    out += seg(0xC2, sof_body)

    for spec in scans:
        kind = spec[0]
        if kind in ("dc_first", "dc_refine"):
            al = spec[1]
            ah = 0 if kind == "dc_first" else al + 1
            # MCU-interleaved over every component
            blocks = []  # (ci, zz) in scan order
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (hi, vi) in enumerate(sampling):
                        for v in range(vi):
                            for hh in range(hi):
                                blocks.append((ci, grids[ci][my * vi + v][mx * hi + hh]))
            # group blocks into MCUs so DRI restarts land on MCU bounds
            per_mcu = sum(hi * vi for hi, vi in sampling)
            entropy = bytearray()
            bw = _BitWriter()
            rst = 0
            if kind == "dc_first":
                syms = set()
                preds = [0] * len(planes)
                items = []
                for mi in range(0, len(blocks), per_mcu):
                    if ac_restart and mi and (mi // per_mcu) % ac_restart == 0:
                        preds = [0] * len(planes)
                        items.append(None)  # restart sentinel
                    for ci, zz in blocks[mi : mi + per_mcu]:
                        v = zz[0] >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _category(diff)
                        syms.add(s)
                        items.append((s, diff))
                bits, vals, codes = _fixed_table(sorted(syms))
                out += seg(0xC4, bytes([0x00]) + bits + vals)
                for item in items:
                    if item is None:
                        entropy += bw.flush()
                        entropy += bytes([0xFF, 0xD0 + (rst % 8)])
                        rst += 1
                        bw = _BitWriter()
                        continue
                    s, diff = item
                    code, length = codes[s]
                    bw.put(code, length)
                    if s:
                        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
            else:
                for mi in range(0, len(blocks), per_mcu):
                    if ac_restart and mi and (mi // per_mcu) % ac_restart == 0:
                        entropy += bw.flush()
                        entropy += bytes([0xFF, 0xD0 + (rst % 8)])
                        rst += 1
                        bw = _BitWriter()
                    for ci, zz in blocks[mi : mi + per_mcu]:
                        bw.put((zz[0] >> al) & 1, 1)
            entropy += bw.flush()
            sos = bytes([len(planes)])
            for ci in range(len(planes)):
                sos += bytes([ci + 1, 0x00])
            sos += bytes([0, 0, (ah << 4) | al])
            out += seg(0xDA, sos) + bytes(entropy)
            continue

        _, comp, ss, se, al = spec
        hi, vi = sampling[comp]
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        bx, by = (cw + 7) // 8, (ch + 7) // 8
        blocks = [grids[comp][gy][gx] for gy in range(by) for gx in range(bx)]
        # first pass: symbol set (fixed-length table needs it); EOBn
        # symbols r<<4 for r up to 14 may appear — collect exactly
        syms = set()
        runs = []
        if kind == "ac_first":
            for zz in blocks:
                r = 0
                for k in range(ss, se + 1):
                    t = abs(zz[k]) >> al
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        syms.add(0xF0)
                        r -= 16
                    syms.add((r << 4) | t.bit_length())
                    r = 0
            # any EOBn length can appear; add all r the runs can need
            nb = len(blocks)
            for r in range((nb.bit_length() if nb else 1)):
                syms.add(r << 4)
        else:
            for zz in blocks:
                ab = [abs(zz[k]) >> al for k in range(ss, se + 1)]
                eobi = max((i for i, t in enumerate(ab) if t == 1), default=-1)
                r = 0
                for i, t in enumerate(ab):
                    if t == 0:
                        r += 1
                        continue
                    if t > 1:
                        continue
                    while r > 15 and i <= eobi:
                        syms.add(0xF0)
                        r -= 16
                    syms.add((r << 4) | 1)
                    r = 0
            nb = len(blocks)
            for r in range((nb.bit_length() if nb else 1)):
                syms.add(r << 4)
        bits, vals, codes = _fixed_table(sorted(syms))
        out += seg(0xC4, bytes([0x10]) + bits + vals)
        ah = 0 if kind == "ac_first" else al + 1
        sos = bytes([1, comp + 1, 0x00, ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)

        sw = _ProgScanWriter(codes)
        entropy = bytearray()
        rst = 0
        for bi, zz in enumerate(blocks):
            if ac_restart and bi and bi % ac_restart == 0:
                sw.flush_eobrun()
                entropy += sw.bw.flush()
                entropy += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                sw = _ProgScanWriter(codes)
            if kind == "ac_first":
                r = 0
                for k in range(ss, se + 1):
                    t = abs(zz[k]) >> al
                    if t == 0:
                        r += 1
                        continue
                    sw.flush_eobrun()
                    while r > 15:
                        sw.sym(0xF0)
                        r -= 16
                    s = t.bit_length()
                    sw.sym((r << 4) | s)
                    sw.bw.put(t if zz[k] > 0 else (-t) + (1 << s) - 1, s)
                    r = 0
                if r > 0:
                    sw.eobrun += 1
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eobrun()
            else:  # ac_refine
                ab = [abs(zz[k]) >> al for k in range(ss, se + 1)]
                eobi = max((i for i, t in enumerate(ab) if t == 1), default=-1)
                r = 0
                br_local = []
                for i, t in enumerate(ab):
                    if t == 0:
                        r += 1
                        continue
                    if t > 1:
                        br_local.append(t & 1)
                        continue
                    # t == 1: newly significant
                    while r > 15 and i <= eobi:
                        sw.flush_eobrun()
                        sw.sym(0xF0)
                        r -= 16
                        for b in br_local:
                            sw.bw.put(b, 1)
                        br_local = []
                    sw.flush_eobrun()
                    sw.sym((r << 4) | 1)
                    sw.bw.put(1 if zz[ss + i] > 0 else 0, 1)
                    r = 0
                    for b in br_local:
                        sw.bw.put(b, 1)
                    br_local = []
                if r > 0 or br_local:
                    sw.eobrun += 1
                    sw.pending_bits.extend(br_local)
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eobrun()
        sw.flush_eobrun()
        entropy += sw.bw.flush()
        out += bytes(entropy)
    return out + b"\xff\xd9"


def test_decode_jpeg_progressive_gray_spectral_selection():
    """DC SA + band-split AC, no AC successive approximation:
    progressive decode must equal the baseline decode of the same
    coefficients EXACTLY."""
    w, h = 24, 16
    img = np.frombuffer(_pixels(w * h, seed=61), dtype=np.uint8).reshape(h, w)
    base = decode_jpeg(_encode_jpeg([img], w, h, [(1, 1)]))
    scans = [("dc_first", 1), ("dc_refine", 0),
             ("ac_first", 0, 1, 5, 0), ("ac_first", 0, 6, 63, 0)]
    prog = decode_jpeg(_encode_jpeg_progressive([img], w, h, [(1, 1)], scans))
    assert prog == base


def test_decode_jpeg_progressive_gray_full_successive_approximation():
    """The full Annex G machinery — DC SA to bit depth 2, AC first
    scans at Al=1 with EOB runs, AC refinement scans with correction
    bits — reassembles the exact baseline coefficients."""
    w, h = 32, 24
    img = np.frombuffer(_pixels(w * h, seed=62), dtype=np.uint8).reshape(h, w)
    base = decode_jpeg(_encode_jpeg([img], w, h, [(1, 1)]))
    scans = [
        ("dc_first", 2), ("dc_refine", 1), ("dc_refine", 0),
        ("ac_first", 0, 1, 5, 1), ("ac_first", 0, 6, 63, 1),
        ("ac_refine", 0, 1, 5, 0), ("ac_refine", 0, 6, 63, 0),
    ]
    prog = decode_jpeg(_encode_jpeg_progressive([img], w, h, [(1, 1)], scans))
    assert prog == base


@pytest.mark.parametrize("sampling", [[(1, 1), (1, 1), (1, 1)],
                                      [(2, 2), (1, 1), (1, 1)]])
def test_decode_jpeg_progressive_color(sampling):
    """Interleaved DC scans + per-component AC scans, 4:4:4 and 4:2:0."""
    w, h = 16, 16
    rgb = np.frombuffer(_pixels(w * h * 3, seed=63), dtype=np.uint8).reshape(h, w, 3)
    y, cb, cr = _rgb_to_ycbcr_planes(rgb)
    base = decode_jpeg(_encode_jpeg([y, cb, cr], w, h, sampling))
    scans = [
        ("dc_first", 1), ("dc_refine", 0),
        ("ac_first", 0, 1, 63, 1), ("ac_refine", 0, 1, 63, 0),
        ("ac_first", 1, 1, 63, 0),
        ("ac_first", 2, 1, 20, 1), ("ac_refine", 2, 1, 20, 0),
        ("ac_first", 2, 21, 63, 0),
    ]
    prog = decode_jpeg(_encode_jpeg_progressive([y, cb, cr], w, h, sampling, scans))
    assert prog == base


def test_decode_jpeg_progressive_restart_resets_eobrun():
    """RSTn inside an AC scan must reset the EOB run and the DC
    predictors; a mostly-flat image forces long EOB runs across the
    restart boundary."""
    w, h = 64, 8
    img = np.full((h, w), 128, dtype=np.uint8)
    img[0, 0] = 255  # one busy block, the rest all-zero AC bands
    base = decode_jpeg(_encode_jpeg([img], w, h, [(1, 1)]))
    scans = [("dc_first", 0), ("ac_first", 0, 1, 63, 1),
             ("ac_refine", 0, 1, 63, 0)]
    blob = _encode_jpeg_progressive([img], w, h, [(1, 1)], scans, ac_restart=3)
    assert b"\xff\xd0" in blob
    assert decode_jpeg(blob) == base


def test_decode_jpeg_progressive_hand_vector():
    """Hand-assembled 3-scan progressive file (DC first at Al=1, DC
    refinement bit, AC band scan) with every entropy bit written out
    by hand; expected pixels from the textbook double-sum IDCT."""
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    dc_bits = [0] * 16
    dc_bits[3] = 12  # categories 0..11 at length 4
    ac_bits = [0] * 16
    ac_bits[1] = 2   # '00' -> EOB, '01' -> (0,2)
    out = b"\xff\xd8" + seg(0xDB, bytes([0]) + bytes([16] * 64))
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    # scan 1: DC first, Al=1: value 5>>1=2 -> category 2 '0010' + bits '10'
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(range(12)))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    out += bytes([0b00101011])  # '0010' '10' + pad '11'
    # scan 2: DC refinement, Ah=1 Al=0: bit = 5 & 1 = 1
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    out += bytes([0b11111111, 0x00])  # '1' + pad (stuffed FF)
    # scan 3: AC band 1..63, Al=0: (0,2) '01' + '11' (=3), EOB '00'
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x00, 0x02]))
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    out += bytes([0b01110011])  # '01' '11' '00' + pad '11'
    out += b"\xff\xd9"

    got = np.frombuffer(decode_jpeg(out)[4], dtype=np.uint8).reshape(8, 8)
    coef = np.zeros((8, 8))
    coef[0, 0] = 5 * 16   # DC (2<<1)|1 = 5, dequant x16
    coef[0, 1] = 3 * 16   # AC zigzag 1
    want = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * coef[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            want[x, y] = min(255, max(0, round(s / 4) + 128))
    assert np.array_equal(got, want.astype(np.uint8))


# ---------------------------------------------------------------------
# 3-component colorspace signalling (ADVICE r11): Adobe APP14
# transform 0 and component IDs 'R','G','B' mean already-RGB — the
# YCbCr->RGB conversion must be skipped, not applied blindly
# ---------------------------------------------------------------------


def _adobe_app14(transform):
    body = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform])
    return b"\xff\xee" + struct.pack(">H", 2 + len(body)) + body


def _patch_component_ids(blob, ids):
    """Rewrite the SOF and SOS component IDs in an _encode_jpeg blob."""
    b = bytearray(blob)
    i = b.find(b"\xff\xc0")
    assert i > 0
    nf = b[i + 9]
    for c in range(nf):
        b[i + 10 + 3 * c] = ids[c]
    j = b.find(b"\xff\xda")
    assert j > 0
    ns = b[j + 4]
    for c in range(ns):
        b[j + 5 + 2 * c] = ids[c]
    return bytes(b)


def test_decode_jpeg_adobe_rgb_and_rgb_component_ids():
    w = h = 16
    base = (np.arange(w, dtype=np.float64) * 12 % 256)
    r = np.tile(base, (h, 1)).astype(np.uint8)
    g = np.tile(base[::-1], (h, 1)).astype(np.uint8)
    b = np.full((h, w), 128, dtype=np.uint8)
    img = np.stack([r, g, b], axis=-1)
    blob = _encode_jpeg([r, g, b], w, h, [(1, 1)] * 3, quant=1)

    # bare 3-component: treated as YCbCr, so the output is NOT the planes
    got_ycc = np.frombuffer(decode_jpeg(blob)[4], np.uint8).reshape(h, w, 3)
    assert np.max(np.abs(got_ycc.astype(int) - img.astype(int))) > 16

    # Adobe APP14 transform=0 -> the planes come back as stored
    blob0 = blob[:2] + _adobe_app14(0) + blob[2:]
    got = np.frombuffer(decode_jpeg(blob0)[4], np.uint8).reshape(h, w, 3)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 3

    # Adobe APP14 transform=1 -> still YCbCr
    blob1 = blob[:2] + _adobe_app14(1) + blob[2:]
    assert decode_jpeg(blob1)[4] == decode_jpeg(blob)[4]

    # component IDs 'R','G','B' with no APP14 -> already RGB
    blob_rgb = _patch_component_ids(blob, (0x52, 0x47, 0x42))
    got2 = np.frombuffer(decode_jpeg(blob_rgb)[4], np.uint8).reshape(h, w, 3)
    assert np.max(np.abs(got2.astype(int) - img.astype(int))) <= 3
