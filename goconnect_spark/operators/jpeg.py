"""Real baseline-JPEG decoder with only the stdlib + numpy.

Closes the codec layer's last image gap (rounds 10-11 shipped exact
PNG and WAV): `decode_jpeg` is a genuine ITU T.81 baseline decoder —
marker parse, canonical Huffman entropy decode (byte stuffing §B.1.1.5,
restart markers §B.2.1.2), dequantize, zigzag inverse (§A.3.6),
orthonormal 2-D IDCT (§A.3.3, float64 separable via numpy), nearest-
neighbor chroma upsampling, and JFIF YCbCr->RGB (Rec. ITU-T T.871 §7).

Scope — exactly what "baseline" means plus the huffman-sequential
sibling, nothing faked:

- SOF0 (baseline) and SOF1 (extended sequential, huffman, 8-bit)
- 1-component (grayscale) and 3-component (YCbCr) images, any legal
  sampling factors (4:4:4, 4:2:0, 4:2:2, 4:1:1, ...)
- interleaved and single-component scans, DRI/RSTn restart intervals
- progressive (SOF2), arithmetic coding (SOF9+), 12-bit precision and
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
    0xC2: "progressive JPEG (SOF2)",
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


def _decode_block(br: _BitReader, dc_table: dict, ac_table: dict,
                  qtable: np.ndarray, pred: int) -> tuple[np.ndarray, int]:
    """One 8x8 block: huffman -> dequantize -> de-zigzag. Returns the
    natural-order coefficient block and the new DC predictor."""
    coef = np.zeros(64, dtype=np.float64)
    size = br.decode_huffman(dc_table)
    diff = _extend(br.receive(size), size) if size else 0
    pred += diff
    coef[0] = pred * qtable[0]
    k = 1
    while k < 64:
        rs = br.decode_huffman(ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        coef[ZIGZAG[k]] = _extend(br.receive(size), size) * qtable[ZIGZAG[k]]
        k += 1
    return coef.reshape(8, 8), pred


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """Batched orthonormal 2-D inverse DCT + level shift + clamp over
    an (N, 8, 8) coefficient stack -> (N, 8, 8) uint8. One pair of
    broadcast matmuls for the whole scan instead of N tiny ones —
    the entropy decode is inherently serial per scan, but the IDCT
    isn't."""
    spatial = np.matmul(np.matmul(_C.T, coefs), _C)
    return np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode a baseline (SOF0/SOF1, 8-bit, huffman) JPEG. See module
    docstring for the exact scope and the return contract."""
    if data is None or len(data) < 4 or bytes(data[:3]) != b"\xff\xd8\xff":
        raise ValueError("not a JPEG container")
    data = bytes(data)
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None  # (w, h, components) ; component = (cid, hi, vi, tq)
    restart_interval = 0
    adobe_transform = None
    planes: dict[int, np.ndarray] = {}
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
                vals = (struct.unpack(f">64H", raw) if pq else list(raw))
                q = np.zeros(64)
                for z in range(64):
                    q[ZIGZAG[z]] = vals[z]
                qtables[tq] = q
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
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG needs libjpeg (baseline is 8-bit)"
                )
            h, w = struct.unpack(">HH", body[1:5])
            nf = body[5]
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"{_SOF_UNSUPPORTED[marker]} needs libjpeg (only baseline"
                " sequential is decoded here)"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            w, h, comps = frame
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            ns = body[0]
            scan = []  # (component index in frame, dc table, ac table)
            for s in range(ns):
                cs, tables = body[1 + 2 * s], body[2 + 2 * s]
                idx = next(i for i, c in enumerate(comps) if c[0] == cs)
                scan.append((idx, dc_tables[tables >> 4], ac_tables[tables & 0x0F]))
            for idx, _, _ in scan:
                cid, hi, vi, tq = comps[idx]
                if idx not in planes:
                    planes[idx] = np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.uint8)
            br = _BitReader(data, pos + 2 + seglen)
            preds = {idx: 0 for idx, _, _ in scan}
            pending: dict[int, tuple[list, list]] = {
                idx: ([], []) for idx, _, _ in scan}  # (positions, coefs)
            if ns == 1:
                # non-interleaved: MCU = one block, raster over the
                # component's own block grid (§A.2.2)
                idx, dct, act = scan[0]
                cid, hi, vi, tq = comps[idx]
                cw = (w * hi + hmax - 1) // hmax
                ch = (h * vi + vmax - 1) // vmax
                bx, by = (cw + 7) // 8, (ch + 7) // 8
                n_units = bx * by
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
                    else:
                        raise ValueError("JPEG missing restart marker")
                if ns == 1:
                    coef, preds[idx] = _decode_block(
                        br, dct, act, qtables[comps[idx][3]], preds[idx])
                    pending[idx][0].append(((unit // bx) * 8, (unit % bx) * 8))
                    pending[idx][1].append(coef)
                else:
                    my, mx = unit // mcux, unit % mcux
                    for sidx, dct, act in scan:
                        cid, hi, vi, tq = comps[sidx]
                        for v in range(vi):
                            for hh in range(hi):
                                coef, preds[sidx] = _decode_block(
                                    br, dct, act, qtables[tq], preds[sidx])
                                pending[sidx][0].append(
                                    ((my * vi + v) * 8, (mx * hi + hh) * 8))
                                pending[sidx][1].append(coef)
                unit += 1
            for sidx, _, _ in scan:
                positions, coefs = pending[sidx]
                pix = _idct_blocks(np.stack(coefs))
                plane = planes[sidx]
                for (y0, x0), px in zip(positions, pix):
                    plane[y0 : y0 + 8, x0 : x0 + 8] = px
                done[sidx] = True
            br.align_to_marker()
            pos = br.pos
            continue
        pos += 2 + seglen

    if frame is None or not done:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = frame
    if len(comps) not in (1, 3) or adobe_transform == 2:
        raise NotImplementedError(
            f"{len(comps)}-component (CMYK/YCCK) JPEG needs libjpeg"
        )
    if len(done) != len(comps):
        raise ValueError("JPEG scan(s) did not cover every frame component")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for i, (cid, hi, vi, tq) in enumerate(comps):
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        p = planes[i][:ch, :cw]
        if hi != hmax or vi != vmax:  # nearest-neighbor upsample
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w].astype(np.float64))
    if len(comps) == 1:
        return int(w), int(h), 1, 8, full[0].astype(np.uint8).tobytes()
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, b)], axis=-1
    )
    return int(w), int(h), 3, 8, rgb.tobytes()
