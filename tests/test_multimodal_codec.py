"""Real-codec decode path (queries/multimodal_ops.decode_image):
PPM/PNG round-trips through the pure-Python decoders, adversarial
container fixtures, and the registered multimodal_decode_image
query (oracle parity itself is covered by test_oracle_parity)."""

from __future__ import annotations

import hashlib
import random

import pytest

from ingestor_etl_spark.queries import load_all
from ingestor_etl_spark.queries.multimodal_ops import (
    decode_image,
    encode_png,
    encode_ppm,
)

REG = load_all()
SF = "/root/testdata/sf0.001"


def test_ppm_round_trip_and_header_quirks():
    px = bytes(range(48))
    assert decode_image(encode_ppm(px, 4, 4)) == (4, 4, 3, px)
    # comments and multi-whitespace in the header
    assert decode_image(b"P6\n# a comment\n4\t4\n255\n" + px) == (4, 4, 3, px)
    with pytest.raises(ValueError):
        decode_image(b"P6\n4 4\n255\n" + px[:-1])  # truncated
    with pytest.raises(NotImplementedError):
        decode_image(b"P6\n1 1\n65535\n" + b"\0" * 6)  # 16-bit


def test_png_round_trip_all_filters_and_color_types():
    rnd = random.Random(7)
    for ch in (1, 2, 3, 4):
        w, h = 5, 10
        pix = bytes(rnd.randrange(256) for _ in range(w * h * ch))
        for filt in (
            [0] * h,
            [1] * h,
            [2] * h,
            [3] * h,
            [4] * h,
            [(y % 5) for y in range(h)],
        ):
            assert decode_image(encode_png(pix, w, h, ch, filt)) == (
                w,
                h,
                ch,
                pix,
            ), (ch, filt[:3])


def test_png_multiple_idat_chunks():
    """Codecs split IDAT arbitrarily; the decoder must concatenate."""
    import struct
    import zlib

    pix = bytes(range(60))
    whole = encode_png(pix, 5, 4, 3)
    # split the single IDAT into two chunks at an arbitrary byte
    pos = whole.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", whole[pos : pos + 4])
    data = whole[pos + 8 : pos + 8 + length]
    rest = whole[pos + 12 + length :]
    cut = len(data) // 2

    def chunk(ctype, d):
        return (
            struct.pack(">I", len(d))
            + ctype
            + d
            + struct.pack(">I", zlib.crc32(ctype + d) & 0xFFFFFFFF)
        )

    split = (
        whole[:pos]
        + chunk(b"IDAT", data[:cut])
        + chunk(b"IDAT", data[cut:])
        + rest
    )
    assert decode_image(split) == (5, 4, 3, pix)


def test_unknown_container_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


def test_multimodal_decode_image_end_to_end(spark):
    """The registered query: every returned pixel_md5 must equal the
    md5 of the source text's usable prefix (decode inverted encode),
    with container alternating by doc_id parity."""
    from ingestor_etl_spark.catalog import load_table

    texts = {
        r.doc_id: r.text.encode() for r in load_table(spark, SF, "documents").collect()
    }
    rows = REG["multimodal_decode_image"].fn(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        blob = texts[r.doc_id]
        usable = len(blob) - len(blob) % 12
        assert usable >= 12
        assert r.container == ("ppm" if r.doc_id % 2 == 0 else "png")
        assert (r.width, r.channels) == (4, 3)
        assert r.height == usable // 12
        assert r.pixel_md5 == hashlib.md5(blob[:usable]).hexdigest()
        seen.add(r.doc_id)
    # every doc with ≥ one full pixel row is present
    assert seen == {d for d, b in texts.items() if len(b) >= 12}


# ----------------------------------------------------------- WAV codec
def test_wav_roundtrip_exact():
    from ingestor_etl_spark.queries.multimodal_ops import decode_wav, encode_wav

    frames = bytes(range(256)) * 3
    rate, ch, bits, got = decode_wav(encode_wav(frames, 22_050, 2))
    assert (rate, ch, bits) == (22_050, 2, 16)
    assert got == frames


def test_wav_odd_junk_chunk_padding():
    """An odd-length chunk before data must be skipped WITH its RIFF
    pad byte — off-by-one here would shear every later chunk id."""
    from ingestor_etl_spark.queries.multimodal_ops import decode_wav, encode_wav

    frames = b"\x01\x02\x03\x04"
    for junk in (b"x", b"xy", b"xyz", b"", None):
        wav = encode_wav(frames, junk_chunk=junk)
        assert decode_wav(wav)[3] == frames, junk


def test_wav_unsupported_profiles_raise():
    import struct

    import pytest as _pytest

    from ingestor_etl_spark.queries.multimodal_ops import decode_wav, encode_wav

    with _pytest.raises(NotImplementedError):
        decode_wav(b"OggS" + b"\x00" * 40)  # non-RIFF container
    # patch the fmt chunk to a compressed audio_format (3 = float)
    wav = bytearray(encode_wav(b"\x00\x00", junk_chunk=None))
    assert wav[12:16] == b"fmt "
    wav[20:22] = struct.pack("<H", 3)
    with _pytest.raises(NotImplementedError):
        decode_wav(bytes(wav))


def test_wav_missing_data_chunk_raises():
    import pytest as _pytest

    from ingestor_etl_spark.queries.multimodal_ops import decode_wav, encode_wav

    wav = encode_wav(b"\x00\x00", junk_chunk=None)
    truncated = wav[: wav.index(b"data")]
    with _pytest.raises(ValueError):
        decode_wav(truncated)
