"""Decoder robustness fuzz: the 'one bad blob cannot fail a 100 TB
job' contract. Every decode entry point, fed arbitrary bytes OR a
randomly corrupted/truncated valid container, may raise ONLY the
documented exceptions (ValueError for malformed/unrecognized input,
NotImplementedError for honestly-gated variants) or succeed — never
IndexError/struct.error/KeyError/OverflowError/MemoryError, and never
hang on header-implied allocations (each call is wall-bounded)."""

import time

import hypothesis.strategies as st
import pytest
from hypothesis import given, settings

from goconnect_spark.operators.multimodal import (
    decode_bmp,
    decode_features,
    decode_gif,
    decode_gif_frames,
    decode_png,
    decode_wav,
    parse_gif_metadata,
    parse_jpeg_sof,
    parse_media_headers,  # noqa: F401  (JVM-side; not fuzzed here)
    parse_mp4_metadata,
    parse_mp4_video_samples,
)
from goconnect_spark.operators.jpeg import decode_jpeg

ALLOWED = (ValueError, NotImplementedError)

DECODERS = [
    decode_png, decode_gif, decode_gif_frames, decode_bmp, decode_wav,
    decode_jpeg, decode_features,
]
PARSERS = [
    parse_jpeg_sof, parse_mp4_metadata, parse_mp4_video_samples,
    parse_gif_metadata,
]


def _valid_containers():
    """One small valid container per format, built with the repo's own
    encoders / hand-assembly (deterministic)."""
    import struct
    import zlib

    from goconnect_spark.operators.multimodal import encode_png, encode_wav

    out = []
    out.append(encode_png(bytes(range(48)), 4, 4, 3))
    out.append(encode_wav([0, 1000, -1000, 32767, -32768, 7] * 5, 8000, 1, 16))
    # gif: 2x2, 4-color palette, literal-code LZW
    def lzw(indices, mc):
        clear, eoi, width, size = 1 << mc, (1 << mc) + 1, mc + 1, (1 << mc) + 2
        bits = []

        def put(code, wd):
            for i in range(wd):
                bits.append((code >> i) & 1)

        put(clear, mc + 1)
        first = True
        for v in indices:
            put(v, width)
            if not first:
                size += 1
                if size == (1 << width) and width < 12:
                    width += 1
            first = False
        put(eoi, width)
        raw = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j, bit in enumerate(bits[i:i + 8]):
                b |= bit << j
            raw.append(b)
        return bytes(raw)

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    stream = lzw([0, 1, 2, 3], 2)
    gif = (b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x81, 0, 0]) + pal
           + bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([0, 2])
           + bytes([len(stream)]) + stream + b"\x00\x3b")
    out.append(gif)
    # bmp 24-bpp 2x2
    px = bytes(range(12))
    rows = px[6:12] + b"\x00\x00" + px[0:6] + b"\x00\x00"
    out.append(b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
               + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                             len(rows), 0, 0, 0, 0) + rows)
    # jpeg: tiny gray baseline via the hand-file layout used in tests
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body
    dc_bits = [0] * 16
    dc_bits[3] = 12
    ac_bits = [0] * 16
    ac_bits[1] = 2
    blob = (b"\xff\xd8" + seg(0xDB, bytes([0]) + bytes([16] * 64))
            + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(range(12)))
            + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x00, 0x02]))
            + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
            + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + bytes([0b00000011]) + b"\xff\xd9")  # DC cat 0 + AC EOB, 1-padded
    out.append(blob)
    return out


VALID = _valid_containers()


def _check(fn, data):
    t0 = time.time()
    try:
        fn(data)
    except ALLOWED:
        pass
    # anything else propagates and fails the test
    assert time.time() - t0 < 5.0, f"{fn.__name__} too slow on {len(data)}B"


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_decoders_arbitrary_bytes_only_documented_errors(data):
    for fn in DECODERS:
        _check(fn, data)
    for fn in PARSERS:
        fn(data)  # parsers must NEVER raise: None/partial contract


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=len(VALID) - 1),
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=4096),
                  st.integers(min_value=0, max_value=255)),
        min_size=0, max_size=6),
    st.integers(min_value=0, max_value=4096),
)
def test_decoders_corrupted_valid_containers(idx, flips, cut):
    base = bytearray(VALID[idx])
    for pos, val in flips:
        if base:
            base[pos % len(base)] = val
    data = bytes(base[: max(1, cut % (len(base) + 1))])
    for fn in DECODERS:
        _check(fn, data)
    for fn in PARSERS:
        fn(data)


def test_valid_containers_actually_decode():
    """The fuzz corpus is real: every uncorrupted container decodes."""
    assert decode_png(VALID[0])[:2] == (4, 4)
    assert decode_wav(VALID[1])[0] == 8000
    assert decode_gif(VALID[2])[:2] == (2, 2)
    assert decode_bmp(VALID[3])[:2] == (2, 2)
    assert decode_jpeg(VALID[4])[:2] == (8, 8)


def test_routing_stack_never_fails_on_arbitrary_blobs(spark):
    """The full JVM+Arrow routing stack (parse_media_headers ->
    with_jpeg_dimensions/profile -> with_gif_metadata ->
    with_mp4_metadata) over random bytes, corrupted containers, empty
    and NULL blobs: never a task failure, schema stable — the routing
    layer must be total even on garbage, because at 100 TB it runs
    BEFORE any quarantine exists."""
    import random

    from goconnect_spark.operators.multimodal import (
        MEDIA_META_SCHEMA,
        parse_media_headers,
        with_gif_metadata,
        with_jpeg_dimensions,
        with_jpeg_profile,
        with_mp4_metadata,
    )

    rng = random.Random(99)
    rows = [(0, None), (1, b""), (2, b"\x00")]
    mid = 3
    for _ in range(60):
        rows.append((mid, bytes(rng.randrange(256)
                                for _ in range(rng.randrange(400)))))
        mid += 1
    for _ in range(60):
        base = bytearray(VALID[rng.randrange(len(VALID))])
        for _ in range(rng.randrange(8)):
            if base:
                base[rng.randrange(len(base))] = rng.randrange(256)
        rows.append((mid, bytes(base[: max(1, rng.randrange(len(base) + 1))])))
        mid += 1
    df = with_mp4_metadata(with_gif_metadata(with_jpeg_profile(
        with_jpeg_dimensions(parse_media_headers(
            spark.createDataFrame(rows, "media_id long, media binary"))))))
    assert df.schema["media_meta"].dataType.simpleString() == MEDIA_META_SCHEMA
    out = df.collect()  # any task failure raises here
    assert len(out) == len(rows)
    assert {r.media_meta["format"] for r in out} <= {
        "png", "wav", "jpeg", "gif", "bmp", "mp4", "unknown"}
