"""Real huffman-JPEG decoder (baseline + progressive) with only the
stdlib + numpy.

Closes the codec layer's last image gap (rounds 10-11 shipped exact
PNG and WAV): `decode_jpeg` is a genuine ITU T.81 huffman decoder —
marker parse, canonical Huffman entropy decode (byte stuffing §B.1.1.5,
restart markers §B.2.1.2), dequantize, zigzag inverse (§A.3.6),
orthonormal 2-D IDCT (§A.3.3, float64 separable via numpy), nearest-
neighbor chroma upsampling, and JFIF YCbCr->RGB (Rec. ITU-T T.871 §7).

Scope — every huffman-coded 8-bit JPEG, nothing faked:

- SOF0 (baseline), SOF1 (extended sequential) and SOF2 (progressive:
  spectral selection + successive approximation, EOB runs, AC
  refinement correction bits — T.81 Annex G, §G.1.2)
- 1-component (grayscale) and 3-component (YCbCr) images, any legal
  sampling factors (4:4:4, 4:2:0, 4:2:2, 4:1:1, ...)
- interleaved and single-component scans, DRI/RSTn restart intervals
  (progressive restarts reset both DC predictors and the EOB run)
- arithmetic coding (SOF9+), lossless (SOF3+), 12-bit precision and
  4-component Adobe CMYK raise NotImplementedError naming libjpeg —
  the honest gate, not a stand-in.

Return contract matches `decode_png`: (width, height, n_channels, 8,
pixels) with `pixels` row-major interleaved 8-bit samples (RGB for
color images, single plane for grayscale).

Determinism note: IDCT is float64 with round-half-away handled by
numpy rounding then clip — the same arithmetic on every platform this
engine targets; tests pin hand-computed spec vectors (DC-only and
single-AC blocks against an independently coded IDCT formula) plus
tolerance-bounded round-trips through a test-side encoder, so a
mirrored encoder/decoder bug cannot hide.

Reference parity note: the reference engine (amient/goconnect) has no
media codecs at all — this layer exists for the 100 TB multimodal
training-data mandate, where JPEG is the dominant image container.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order (ITU T.81 §A.3.6): zigzag index -> natural index
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# orthonormal 8x8 DCT basis: IDCT(spatial) = C.T @ coef @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

_SOF_UNSUPPORTED = {
    0xC3: "lossless JPEG (SOF3)",
    0xC5: "differential sequential JPEG (SOF5)",
    0xC6: "differential progressive JPEG (SOF6)",
    0xC7: "differential lossless JPEG (SOF7)",
    0xC9: "arithmetic-coded JPEG (SOF9)",
    0xCA: "arithmetic progressive JPEG (SOF10)",
    0xCB: "arithmetic lossless JPEG (SOF11)",
    0xCD: "differential arithmetic JPEG (SOF13)",
    0xCE: "differential arithmetic progressive JPEG (SOF14)",
    0xCF: "differential arithmetic lossless JPEG (SOF15)",
}


def _build_huffman(bits: bytes, values: bytes) -> dict:
    """Canonical JPEG Huffman table (T.81 §C.2): {(length, code): value}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment: un-stuffs
    0xFF00, stops at any real marker (leaving it for the caller)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("JPEG entropy stream truncated")
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2  # stuffed byte (§B.1.1.5)
            else:
                # a real marker: the spec pads the last byte with 1-bits,
                # so feed 1s and let the block loop finish (§F.2.2.5)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")

    def align_to_marker(self):
        """Discard pad bits and position at the next marker byte."""
        self.acc, self.nbits = 0, 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                return
            self.pos += 1


def _extend(v: int, size: int) -> int:
    """DC/AC difference magnitude decode (T.81 §F.2.2.1 EXTEND)."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _scan_block(br: _BitReader, coef: list, dc_table, ac_table,
                ss: int, se: int, ah: int, al: int, pred: int,
                eobrun: int) -> tuple[int, int]:
    """Entropy-decode ONE block's contribution of ONE scan into `coef`
    (64 ints, zigzag order, modified in place). Handles every legal
    scan shape — the baseline full band (ss=0, se=63, ah=al=0) and the
    four progressive shapes (T.81 §G.1.2): DC first (successive-
    approximation point transform << al), DC refinement (one appended
    bit per block), AC first (EOB-run coded band), AC refinement
    (correction bits). Returns (new_dc_pred, new_eobrun)."""
    if ss == 0:
        if ah == 0:  # DC first (or baseline full-band start)
            size = br.decode_huffman(dc_table)
            diff = _extend(br.receive(size), size) if size else 0
            pred += diff
            coef[0] = pred << al
        else:  # DC refinement: append one bit (§G.1.2.1)
            if br.read_bit():
                coef[0] |= 1 << al
            return pred, eobrun
        if se == 0:
            return pred, eobrun
        k = 1
    else:
        k = ss

    if ah == 0:  # AC first scan (and the baseline AC tail)
        if eobrun > 0:
            return pred, eobrun - 1
        while k <= se:
            rs = br.decode_huffman(ac_table)
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run == 15:  # ZRL: sixteen zeros
                    k += 16
                    continue
                # EOBn: this block ends; the next 2^run-1 (+bits)
                # blocks have an all-zero band (§G.1.2.2)
                eobrun = (1 << run) - 1
                if run:
                    eobrun += br.receive(run)
                break
            k += run
            if k > se:
                raise ValueError("JPEG AC run past end of band")
            coef[k] = _extend(br.receive(size), size) << al
            k += 1
        return pred, eobrun

    # AC refinement (§G.1.2.3): newly-significant coefficients arrive
    # as ±1<<al; already-nonzero ones get a correction bit
    p1, m1 = 1 << al, -1 << al
    if eobrun == 0:
        while k <= se:
            rs = br.decode_huffman(ac_table)
            run, size = rs >> 4, rs & 0x0F
            newval = 0
            if size == 0:
                if run < 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += br.receive(run)
                    break  # correction sweep for k..se happens below
                # run == 15: skip 16 zero-history coefficients
            else:
                if size != 1:
                    raise ValueError("JPEG AC refinement size must be 1")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                c = coef[k]
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        coef[k] = c + (p1 if c > 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = coef[k]
            if c != 0:
                if br.read_bit() and (c & p1) == 0:
                    coef[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return pred, eobrun


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """Batched orthonormal 2-D inverse DCT + level shift + clamp over
    an (N, 8, 8) coefficient stack -> (N, 8, 8) uint8. One pair of
    broadcast matmuls for the whole scan instead of N tiny ones —
    the entropy decode is inherently serial per scan, but the IDCT
    isn't."""
    spatial = np.matmul(np.matmul(_C.T, coefs), _C)
    return np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode a huffman-coded 8-bit JPEG — baseline (SOF0), extended
    sequential (SOF1) or progressive (SOF2). See module docstring for
    the exact scope and the return contract."""
    if data is None or len(data) < 4 or bytes(data[:3]) != b"\xff\xd8\xff":
        raise ValueError("not a JPEG container")
    data = bytes(data)
    qtables: dict[int, np.ndarray] = {}  # zigzag order
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (w, h, components, progressive); component = (cid, hi, vi, tq)
    restart_interval = 0
    adobe_transform = None
    # per-component (block_rows, block_cols, 64) zigzag coefficient
    # grids — scans ACCUMULATE into these (progressive needs it; the
    # baseline single scan is just the degenerate full-band case)
    coef_grids: dict[int, np.ndarray] = {}
    done: dict[int, bool] = {}

    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("desynced JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = (data[pos + 2] << 8) | data[pos + 3]
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ValueError("truncated JPEG segment")
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 * (2 if pq else 1)
                raw = body[i : i + n]
                if len(raw) < n:
                    raise ValueError("truncated JPEG DQT")
                vals = (struct.unpack(">64H", raw) if pq else list(raw))
                qtables[tq] = np.array(vals, dtype=np.float64)  # zigzag
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = body[i + 1 : i + 17]
                n = sum(bits)
                values = body[i + 17 : i + 17 + n]
                if len(values) < n:
                    raise ValueError("truncated JPEG DHT")
                (dc_tables if tc == 0 else ac_tables)[th] = _build_huffman(bits, values)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = (body[0] << 8) | body[1]
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            adobe_transform = body[11]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG needs libjpeg (huffman JPEG is 8-bit here)"
                )
            h, w = struct.unpack(">HH", body[1:5])
            nf = body[5]
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps, marker == 0xC2)
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"{_SOF_UNSUPPORTED[marker]} needs libjpeg (huffman"
                " sequential + progressive are decoded here)"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            w, h, comps, progressive = frame
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            if not coef_grids:
                for i, (cid, hi, vi, tq) in enumerate(comps):
                    coef_grids[i] = np.zeros(
                        (mcuy * vi, mcux * hi, 64), dtype=np.int64)
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("truncated JPEG SOS header")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            elif ss > 0 and ns != 1:
                raise ValueError("progressive AC scans must be non-interleaved")
            elif ss > se or se > 63:
                raise ValueError("illegal JPEG spectral band")
            need_dc = ss == 0 and ah == 0
            need_ac = se > 0
            scan = []  # (component index in frame, dc table, ac table)
            for s in range(ns):
                cs, tables = body[1 + 2 * s], body[2 + 2 * s]
                idx = next(i for i, c in enumerate(comps) if c[0] == cs)
                tdc = dc_tables.get(tables >> 4) if need_dc else None
                tac = ac_tables.get(tables & 0x0F) if need_ac else None
                if (need_dc and tdc is None) or (need_ac and tac is None):
                    raise ValueError("JPEG scan references a missing huffman table")
                scan.append((idx, tdc, tac))
            br = _BitReader(data, pos + 2 + seglen)
            preds = {idx: 0 for idx, _, _ in scan}
            eobrun = 0
            if ns == 1:
                # non-interleaved: MCU = one block, raster over the
                # component's own block grid (§A.2.2)
                idx, dct, act = scan[0]
                cid, hi, vi, tq = comps[idx]
                cw = (w * hi + hmax - 1) // hmax
                ch = (h * vi + vmax - 1) // vmax
                bx = (cw + 7) // 8
                n_units = bx * ((ch + 7) // 8)
                grid0 = coef_grids[idx]
            else:
                n_units = mcux * mcuy
            unit = 0
            while unit < n_units:
                if restart_interval and unit and unit % restart_interval == 0:
                    br.align_to_marker()
                    m = data[br.pos : br.pos + 2]
                    if len(m) == 2 and m[0] == 0xFF and 0xD0 <= m[1] <= 0xD7:
                        br.pos += 2
                        preds = {k: 0 for k in preds}
                        eobrun = 0
                    else:
                        raise ValueError("JPEG missing restart marker")
                if ns == 1:
                    blk = grid0[unit // bx, unit % bx].tolist()
                    preds[idx], eobrun = _scan_block(
                        br, blk, dct, act, ss, se, ah, al, preds[idx], eobrun)
                    grid0[unit // bx, unit % bx] = blk
                else:
                    my, mx = unit // mcux, unit % mcux
                    for sidx, dct, act in scan:
                        cid, hi, vi, tq = comps[sidx]
                        g = coef_grids[sidx]
                        for v in range(vi):
                            for hh in range(hi):
                                gy, gx = my * vi + v, mx * hi + hh
                                blk = g[gy, gx].tolist()
                                preds[sidx], eobrun = _scan_block(
                                    br, blk, dct, act, ss, se, ah, al,
                                    preds[sidx], eobrun)
                                g[gy, gx] = blk
                unit += 1
            if ss == 0:  # a component is renderable once its DC arrived
                for sidx, _, _ in scan:
                    done[sidx] = True
            br.align_to_marker()
            pos = br.pos
            continue
        pos += 2 + seglen

    if frame is None or not coef_grids:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps, progressive = frame
    if len(comps) not in (1, 3) or adobe_transform == 2:
        raise NotImplementedError(
            f"{len(comps)}-component (CMYK/YCCK) JPEG needs libjpeg"
        )
    if len(done) != len(comps):
        raise ValueError("JPEG scan(s) did not cover every component's DC band")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    nat_order = list(ZIGZAG)
    full = []
    for i, (cid, hi, vi, tq) in enumerate(comps):
        if tq not in qtables:
            raise ValueError("JPEG component references a missing quant table")
        grid = coef_grids[i]
        by_, bx_ = grid.shape[0], grid.shape[1]
        deq = grid.reshape(-1, 64).astype(np.float64) * qtables[tq]
        nat = np.empty_like(deq)
        nat[:, nat_order] = deq  # de-zigzag: natural[ZIGZAG[z]] = zz[z]
        pix = _idct_blocks(nat.reshape(-1, 8, 8))
        plane = (pix.reshape(by_, bx_, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(by_ * 8, bx_ * 8))
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        p = plane[:ch, :cw]
        if hi != hmax or vi != vmax:  # nearest-neighbor upsample
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w].astype(np.float64))
    if len(comps) == 1:
        return int(w), int(h), 1, 8, full[0].astype(np.uint8).tobytes()
    # 3-component colorspace: Adobe APP14 transform 0 declares the
    # components are ALREADY RGB (as do component IDs 'R','G','B' —
    # the convention Adobe writes without an APP14); everything else
    # (JFIF, APP14 transform 1, bare) is YCbCr per T.871
    comp_ids = tuple(c[0] for c in comps)
    if adobe_transform == 0 or comp_ids == (0x52, 0x47, 0x42):
        rgb = np.stack(
            [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in full],
            axis=-1,
        )
        return int(w), int(h), 3, 8, rgb.tobytes()
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, b)], axis=-1
    )
    return int(w), int(h), 3, 8, rgb.tobytes()
