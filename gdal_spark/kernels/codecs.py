"""Pure-stdlib media codecs: PNG, BMP, 16-bit PCM WAV.

Real decoders for the multimodal column family — no PIL/libjpeg/ffmpeg
in this container, but none are needed for these formats: PNG is zlib
(stdlib) + per-scanline filters (numpy), BMP and WAV are struct parsing.

Format references (public specs; the reference engine's own readers):
  PNG — W3C PNG spec §4 (IHDR/IDAT/IEND chunks, filter types 0-4);
        /root/reference/frmts/png/pngdataset.cpp reads the same layout
        through libpng.
  BMP — BITMAPFILEHEADER/BITMAPINFOHEADER, bottom-up 24-bit BGR rows
        padded to 4 bytes; /root/reference/frmts/bmp/bmpdataset.cpp:61
        documents the identical header fields.
  WAV — RIFF/WAVE 'fmt ' + 'data' chunks, PCM format tag 1.

Scope (raise ValueError outside it — loud, like the reference's driver
Identify failures): PNG bit depth 8, color types 0/2/3/4/6, interlace
none; BMP 24-bit uncompressed; WAV 16-bit PCM.

Decoded representation: images -> (h, w, 3) uint8 RGB (gray/palette/
alpha expand to RGB, alpha dropped — the raster engine carries bands,
not compositing); audio -> ((n, channels) int16, sample_rate).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    off = 8
    ihdr = None
    idat = []
    plte = None
    while off < len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        ctype = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + ln]
        off += 12 + ln  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)  # headroom for the filter sums
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = ch
    for y in range(h):
        f = int(filters[y])
        cur = rows[y]
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(stride, np.int64)
        if f == 0:
            line = cur
        elif f == 1:  # Sub: recon = raw + left  ->  per-lane cumsum mod 256
            line = cur.reshape(w, bpp).cumsum(axis=0).reshape(stride)
        elif f == 2:  # Up
            line = cur + prev
        elif f == 3:  # Average (needs sequential left)
            line = np.empty(stride, np.int64)
            for x in range(stride):
                a = line[x - bpp] & 0xFF if x >= bpp else 0
                line[x] = cur[x] + ((a + prev[x]) >> 1)
        elif f == 4:  # Paeth
            line = np.empty(stride, np.int64)
            for x in range(stride):
                a = line[x - bpp] & 0xFF if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                line[x] = cur[x] + _paeth(int(a), int(prev[x]), int(c))
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = (line & 0xFF).astype(np.uint8)
    img = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[img[:, :, 0]]
    if ch == 1:  # gray -> RGB
        return np.repeat(img, 3, axis=2)
    if ch == 2:  # gray+alpha -> RGB (alpha dropped)
        return np.repeat(img[:, :, :1], 3, axis=2)
    if ch == 4:  # RGBA -> RGB
        return img[:, :, :3]
    return img


def encode_png(arr: np.ndarray, filter_mode: str = "mixed") -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (color type 2, bit depth 8).

    filter_mode 'none' writes filter 0 rows; 'mixed' cycles row filters
    0,1,2,3,4 so decoders exercise every unfilter path deterministically.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    bpp = 3
    stride = w * bpp
    flat = arr.reshape(h, stride).astype(np.int64)
    lines = []
    for y in range(h):
        f = 0 if filter_mode == "none" else y % 5
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, np.int64)
        left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = cur - pred
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    (data_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression {compression}")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(
        data, dtype=np.uint8, count=h * row_bytes, offset=data_off
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    body = rows.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE 16-bit PCM -> ((n, channels) int16 array, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    off = 12
    fmt = None
    samples = None
    while off + 8 <= len(data):
        cid = data[off : off + 4]
        (ln,) = struct.unpack_from("<I", data, off + 4)
        body = data[off + 8 : off + 8 + ln]
        off += 8 + ln + (ln & 1)  # chunks pad to even length
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            samples = body
    if fmt is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _brate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: format {audio_format}, {bits}-bit")
    arr = np.frombuffer(samples, dtype="<i2")
    return arr.reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 -> RIFF/WAVE 16-bit PCM bytes."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    body = arr.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * 2 * n_ch, 2 * n_ch, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_image(data: bytes) -> np.ndarray:
    """Sniff magic bytes and decode PNG or BMP -> (h, w, 3) uint8 RGB."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    raise ValueError("unsupported image format (not PNG/BMP)")
