"""Vendored minimal image codec: PPM (P6) and uncompressed 24-bit BMP.

Pure Python, zero dependencies — exists so the multimodal operators' REAL
decode branch (``operators/multimodal.py``) is exercisable hermetically in
environments without PIL: decode → grayscale → resample → re-encode runs
on genuine bitmaps, through exactly the same operator plumbing a PIL
deployment uses. It is intentionally tiny: two uncompressed formats, no
color management, nearest-neighbor resampling. A production deployment
uses PIL/libvips through the same per-payload function slots.

Pixel model: ``(width, height, pixels)`` with ``pixels`` a flat
row-major ``list[(r, g, b)]``.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode",
    "encode_ppm",
    "encode_bmp",
    "resize_nearest",
    "grayscale",
]


def _decode_ppm(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]] | None:
    # P6 <ws> width <ws> height <ws> maxval <single-ws> raw RGB triples;
    # '#' comments allowed in the header
    if not payload.startswith(b"P6"):
        return None
    pos, fields = 2, []
    n = len(payload)
    while len(fields) < 3 and pos < n:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if not payload[start:pos].isdigit():
            return None
        fields.append(int(payload[start:pos]))
    if len(fields) < 3 or pos >= n:
        return None
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        return None
    if maxval > 255:  # 2-byte samples — out of scope for the mini codec
        return None
    need = w * h * 3
    raw = payload[pos : pos + need]
    if len(raw) != need:
        return None
    px = [(raw[i], raw[i + 1], raw[i + 2]) for i in range(0, need, 3)]
    return w, h, px


def _decode_bmp(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]] | None:
    # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (>=40), 24bpp, BI_RGB only
    if len(payload) < 54 or not payload.startswith(b"BM"):
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        return None
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if w <= 0 or h == 0 or bpp != 24 or comp != 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    if data_off + stride * h > len(payload):
        return None
    px: list[tuple[int, int, int]] = []
    for row in range(h):
        src_row = (h - 1 - row) if bottom_up else row
        base = data_off + src_row * stride
        for col in range(w):
            b, g, r = payload[base + col * 3 : base + col * 3 + 3]
            px.append((r, g, b))
    return w, h, px


def decode(payload: bytes) -> tuple[str, int, int, list[tuple[int, int, int]]] | None:
    """``(format, width, height, pixels)`` for a PPM/BMP payload, else
    ``None`` (unrecognized or malformed — the caller reports
    "undecodable", it never fakes)."""
    out = _decode_ppm(payload)
    if out is not None:
        return ("ppm", *out)
    out = _decode_bmp(payload)
    if out is not None:
        return ("bmp", *out)
    return None


def encode_ppm(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    if len(pixels) != width * height:
        raise ValueError("encode_ppm: pixel count != width*height")
    body = bytearray(f"P6\n{width} {height}\n255\n".encode())
    for r, g, b in pixels:
        body += bytes((r, g, b))
    return bytes(body)


def encode_bmp(width: int, height: int, pixels: list[tuple[int, int, int]]) -> bytes:
    if len(pixels) != width * height:
        raise ValueError("encode_bmp: pixel count != width*height")
    stride = (width * 3 + 3) & ~3
    img = bytearray()
    for row in range(height - 1, -1, -1):  # bottom-up
        line = bytearray()
        for col in range(width):
            r, g, b = pixels[row * width + col]
            line += bytes((b, g, r))
        line += b"\x00" * (stride - len(line))
        img += line
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(img), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(img), 2835, 2835, 0, 0)
    return bytes(header + img)


def resize_nearest(
    width: int,
    height: int,
    pixels: list[tuple[int, int, int]],
    new_w: int,
    new_h: int,
) -> list[tuple[int, int, int]]:
    if new_w <= 0 or new_h <= 0:
        raise ValueError("resize_nearest: target dims must be positive")
    out: list[tuple[int, int, int]] = []
    for y in range(new_h):
        sy = min(height - 1, y * height // new_h)
        row = sy * width
        for x in range(new_w):
            out.append(pixels[row + min(width - 1, x * width // new_w)])
    return out


def grayscale(pixels: list[tuple[int, int, int]]) -> list[int]:
    """Integer ITU-R 601 luma per pixel (same weighting PIL's "L" uses)."""
    return [(r * 299 + g * 587 + b * 114) // 1000 for r, g, b in pixels]
