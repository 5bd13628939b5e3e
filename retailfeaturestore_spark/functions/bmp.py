"""Pure-stdlib BMP (Windows DIB) codec — 24-bit uncompressed.

Third real image codec behind the multimodal extract seam (with
``functions/ppm.py`` and ``functions/png.py``): covers the classic
uncompressed interchange format.  Supports BITMAPINFOHEADER (and larger
headers that begin with it), 24 bits per pixel, BI_RGB (no compression),
bottom-up AND top-down row order; everything else raises ``ValueError``
with a reason — the honest-rejection contract the other codecs follow.
"""

from __future__ import annotations

import struct

__all__ = ["decode_bmp", "bmp_to_rgb", "encode_bmp"]


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """-> (width, height, rgb bytes, top-down row order, 3 B/pixel)."""
    if len(data) < 54:
        raise ValueError("BMP truncated: shorter than the two headers")
    if data[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size} (< BITMAPINFOHEADER)")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1:
        raise ValueError(f"unsupported planes {planes}")
    if bpp != 24:
        raise ValueError(f"unsupported bits-per-pixel {bpp} (only 24-bit)")
    if compression != 0:
        raise ValueError(f"unsupported compression {compression} (only BI_RGB)")
    if width <= 0 or height == 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    top_down = height < 0
    height = abs(height)
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    need = pixel_off + stride * height
    if len(data) < need:
        raise ValueError(f"BMP truncated: need {need} bytes, have {len(data)}")
    out = bytearray(row_bytes * height)
    for r in range(height):
        src_row = r if top_down else height - 1 - r
        src = pixel_off + src_row * stride
        dst = r * row_bytes
        row = data[src : src + row_bytes]
        # BGR -> RGB
        out[dst : dst + row_bytes : 3] = row[2::3]
        out[dst + 1 : dst + row_bytes : 3] = row[1::3]
        out[dst + 2 : dst + row_bytes : 3] = row[0::3]
    return width, height, bytes(out)


def bmp_to_rgb(data: bytes) -> tuple[int, int, bytes]:
    """Same contract as ``png_to_rgb`` / ``decode_ppm``: (w, h, RGB)."""
    return decode_bmp(data)


def encode_bmp(width: int, height: int, rgb: bytes, top_down: bool = False) -> bytes:
    """24-bit BI_RGB writer (row padding, BGR, bottom-up by default) —
    fixture generator for the round-trip tests."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length does not match dimensions")
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    pad = b"\x00" * (stride - row_bytes)
    rows = []
    order = range(height) if top_down else range(height - 1, -1, -1)
    for r in order:
        row = rgb[r * row_bytes : (r + 1) * row_bytes]
        bgr = bytearray(row_bytes)
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        rows.append(bytes(bgr) + pad)
    pixels = b"".join(rows)
    pixel_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pixel_off + len(pixels), 0, 0, pixel_off)
    dib = struct.pack(
        "<IiiHHIIiiII",
        40, width, -height if top_down else height, 1, 24, 0,
        len(pixels), 2835, 2835, 0, 0,
    )
    return header + dib + pixels
