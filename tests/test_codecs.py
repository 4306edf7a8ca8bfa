"""Golden + round-trip tests for the pure-stdlib media codecs.

The PNG goldens are hand-computed from the W3C PNG spec filter
definitions (§9 Filtering) — raw filtered bytes written literally,
expected reconstructions derived by hand — so an encoder/decoder pair
sharing a mirrored sign error cannot pass. WAV is cross-checked against
the stdlib `wave` module (an independent implementation).
"""

import struct
import wave
import zlib
from io import BytesIO

import numpy as np
import pytest

from gdal_spark.kernels import codecs


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _png(w, h, color, scanlines: bytes, plte: bytes | None = None) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = codecs._PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(scanlines)) + _chunk(b"IEND", b"")


# --- hand-computed filter goldens (spec §9: Sub/Up/Average/Paeth) ---


def test_png_sub_and_up_filters_golden():
    # row0 Sub: recon = raw + left-pixel; row1 Up: recon = raw + above
    raw = b"\x01" + bytes([10, 20, 30, 5, 5, 5]) + b"\x02" + bytes([1, 2, 3, 4, 5, 6])
    img = codecs.decode_png(_png(2, 2, 2, raw))
    expect = np.array(
        [[[10, 20, 30], [15, 25, 35]], [[11, 22, 33], [19, 30, 41]]], np.uint8
    )
    assert np.array_equal(img, expect)


def test_png_paeth_filter_golden():
    raw = (
        b"\x00" + bytes([100, 110, 120, 130, 140, 150])
        + b"\x04" + bytes([1, 1, 1, 2, 2, 2])
    )
    img = codecs.decode_png(_png(2, 2, 2, raw))
    # x<bpp: pred = above; x>=bpp: p=a+b-c picks b (pb=1 smallest) per spec
    expect = np.array(
        [[[100, 110, 120], [130, 140, 150]], [[101, 111, 121], [132, 142, 152]]],
        np.uint8,
    )
    assert np.array_equal(img, expect)


def test_png_average_filter_golden():
    raw = b"\x03" + bytes([8, 10, 12, 100, 3, 5])
    img = codecs.decode_png(_png(2, 1, 2, raw))
    # prev row = 0: recon = raw + (left >> 1)
    expect = np.array([[[8, 10, 12], [104, 8, 11]]], np.uint8)
    assert np.array_equal(img, expect)


def test_png_average_wraps_mod_256():
    # left=250, raw=200 -> 200 + (250>>1) = 325 -> 69 mod 256
    raw = b"\x03" + bytes([250, 0, 0, 200, 0, 0])
    img = codecs.decode_png(_png(2, 1, 2, raw))
    assert img[0, 1, 0] == (200 + (250 >> 1)) % 256


# --- color-type expansion ---


def test_png_grayscale_expands_to_rgb():
    img = codecs.decode_png(_png(3, 1, 0, b"\x00" + bytes([7, 200, 33])))
    assert np.array_equal(
        img, np.array([[[7, 7, 7], [200, 200, 200], [33, 33, 33]]], np.uint8)
    )


def test_png_palette_lookup():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    img = codecs.decode_png(_png(3, 1, 3, b"\x00" + bytes([2, 0, 1]), plte=plte))
    assert np.array_equal(
        img, np.array([[[0, 0, 255], [255, 0, 0], [0, 255, 0]]], np.uint8)
    )


def test_png_alpha_dropped():
    rgba = codecs.decode_png(_png(1, 1, 6, b"\x00" + bytes([1, 2, 3, 99])))
    assert np.array_equal(rgba, np.array([[[1, 2, 3]]], np.uint8))
    ga = codecs.decode_png(_png(1, 1, 4, b"\x00" + bytes([50, 10])))
    assert np.array_equal(ga, np.array([[[50, 50, 50]]], np.uint8))


# --- round trips (encoder exercises all five filter types in 'mixed') ---


@pytest.mark.parametrize("mode", ["none", "mixed"])
@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (7, 5), (16, 12), (33, 31)])
def test_png_round_trip(mode, shape):
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    arr = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(arr, mode)), arr)


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])  # row padding to 4 bytes
def test_bmp_round_trip_padding(w):
    rng = np.random.default_rng(w)
    arr = rng.integers(0, 256, size=(3, w, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(arr)), arr)


def test_bmp_top_down():
    # negative height in BITMAPINFOHEADER = top-down row order
    arr = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    data = bytearray(codecs.encode_bmp(arr))
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    rows = np.frombuffer(bytes(data[54:]), np.uint8).reshape(2, -1)
    flipped = bytes(data[:54]) + rows[::-1].tobytes()
    assert np.array_equal(codecs.decode_bmp(flipped), arr)


def test_cross_codec_same_pixels():
    from gdal_spark.operators.multimodal import pattern_rgb

    arr = pattern_rgb(42, 16, 12)
    assert np.array_equal(
        codecs.decode_png(codecs.encode_png(arr, "mixed")),
        codecs.decode_bmp(codecs.encode_bmp(arr)),
    )


# --- WAV vs the independent stdlib wave module ---


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_against_stdlib_wave(channels):
    rng = np.random.default_rng(channels)
    pcm = rng.integers(-32768, 32768, size=(200, channels), dtype=np.int16)

    # our encoder -> stdlib reader
    data = codecs.encode_wav(pcm, 8000)
    with wave.open(BytesIO(data)) as rd:
        assert rd.getnchannels() == channels
        assert rd.getframerate() == 8000
        assert rd.getsampwidth() == 2
        got = np.frombuffer(rd.readframes(200), "<i2").reshape(-1, channels)
    assert np.array_equal(got, pcm)

    # stdlib writer -> our decoder
    buf = BytesIO()
    with wave.open(buf, "wb") as wr:
        wr.setnchannels(channels)
        wr.setsampwidth(2)
        wr.setframerate(44100)
        wr.writeframes(pcm.tobytes())
    arr, rate = codecs.decode_wav(buf.getvalue())
    assert rate == 44100
    assert np.array_equal(arr, pcm)


# --- loud failures outside scope ---


def test_unsupported_formats_raise():
    with pytest.raises(ValueError, match="image format"):
        codecs.decode_image(b"\xff\xd8\xff\xe0JFIF....")  # JPEG magic
    with pytest.raises(ValueError, match="bit depth"):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
        codecs.decode_png(
            codecs._PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="RIFF"):
        codecs.decode_wav(b"OggS" + b"\x00" * 40)
    with pytest.raises(ValueError, match="unsupported BMP"):
        arr = np.zeros((1, 1, 3), np.uint8)
        bad = bytearray(codecs.encode_bmp(arr))
        struct.pack_into("<H", bad, 28, 8)  # claim 8bpp
        codecs.decode_bmp(bytes(bad))
