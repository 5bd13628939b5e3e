"""Pure-stdlib PNG codec — closes the multimodal decode seam for the most
common real-world image format.

The container carries no libpng/PIL, but PNG's container layer is plain
stdlib: chunk framing is ``struct``, pixel data is ``zlib``-deflated
scanlines, and integrity is ``zlib.crc32``.  This module implements the
non-interlaced 8-bit subset (greyscale, RGB, palette, grey+alpha, RGBA —
the overwhelming majority of real PNGs) with all five scanline filters
(None/Sub/Up/Average/Paeth, PNG spec §9), decoding to raw RGB so
``operators.multimodal.extract_features(decode_stub='png')`` computes real
image statistics through the exact same Arrow-batched ``mapInPandas`` seam
as the PPM path.  Reference parity target: the reference engine has no
media path at all — this is extension surface (SURVEY.md LLM-pipeline
multimodal row); the unfiltering algorithm follows the public PNG
specification (RFC 2083 / W3C PNG), not any existing codec's source.

Deliberately out of scope (raise ValueError, surfaced per-row by the
caller): interlaced images (Adam7), bit depths other than 8, and ancillary
transforms (gamma, transparency chunks).  A 16-bit/interlace pipeline swaps
in a real codec library at the same seam.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["encode_png", "decode_png", "png_to_rgb"]

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB bytes as a minimal truecolor PNG (filter 0 rows)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse the per-scanline filters (PNG spec §9) -> packed samples."""
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        if len(line) < stride:
            raise ValueError("truncated PNG scanline data")
        pos += stride
        row_off = y * stride
        prev_off = row_off - stride
        if ftype == 0:  # None
            out[row_off : row_off + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[row_off + x - bpp] if x >= bpp else 0
                out[row_off + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            if y == 0:
                out[row_off : row_off + stride] = line
            else:
                for x in range(stride):
                    out[row_off + x] = (line[x] + out[prev_off + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[row_off + x - bpp] if x >= bpp else 0
                up = out[prev_off + x] if y > 0 else 0
                out[row_off + x] = (line[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[row_off + x - bpp] if x >= bpp else 0
                up = out[prev_off + x] if y > 0 else 0
                ul = out[prev_off + x - bpp] if (y > 0 and x >= bpp) else 0
                out[row_off + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse a PNG -> ``(width, height, channels, samples)``.

    ``samples`` is the unfiltered pixel stream in the image's native
    channel layout (palette already expanded to RGB); use :func:`png_to_rgb`
    for a normalized 3-channel view.  Raises ``ValueError`` on anything
    outside the supported subset — the per-row failure surface the
    mapInPandas caller converts to a null feature row.
    """
    if not data.startswith(_SIGNATURE):
        raise ValueError("not a PNG payload")
    pos = len(_SIGNATURE)
    width = height = None
    color_type = -1
    palette = b""
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) < length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced (Adam7) PNG not supported")
        elif tag == b"PLTE":
            palette = payload
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    bpp = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expected = height * (width * bpp + 1)
    if len(raw) != expected:
        raise ValueError(
            f"PNG pixel data length {len(raw)} != expected {expected}"
        )
    samples = _unfilter(raw, width, height, bpp)
    if color_type == 3:  # palette -> RGB
        if not palette:
            raise ValueError("palette PNG missing PLTE chunk")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(samples):
            off = idx * 3
            if off + 3 > len(palette):
                raise ValueError(f"palette index {idx} out of range")
            rgb[i * 3 : i * 3 + 3] = palette[off : off + 3]
        return width, height, 3, bytes(rgb)
    return width, height, bpp, bytes(samples)


def png_to_rgb(data: bytes) -> tuple[int, int, bytes]:
    """Decode and normalize to 3-channel RGB (grey replicated, alpha
    dropped) — the layout the feature extractor shares with the PPM path."""
    width, height, channels, samples = decode_png(data)
    if channels == 3:
        return width, height, samples
    n = width * height
    rgb = bytearray(n * 3)
    if channels == 1:  # greyscale
        for i in range(n):
            g = samples[i]
            rgb[i * 3 : i * 3 + 3] = bytes((g, g, g))
    elif channels == 2:  # grey + alpha
        for i in range(n):
            g = samples[i * 2]
            rgb[i * 3 : i * 3 + 3] = bytes((g, g, g))
    else:  # RGBA
        for i in range(n):
            rgb[i * 3 : i * 3 + 3] = samples[i * 4 : i * 4 + 3]
    return width, height, bytes(rgb)
