"""Pure-stdlib WAV (RIFF PCM) codec — the audio instance of the multimodal
decode seam.

Like PPM for images and PNG for compressed images, 16-bit PCM WAV needs no
codec library: the RIFF container is ``struct`` framing and the samples are
raw little-endian int16.  This gives the engine a REAL audio decode path —
``operators.multimodal.extract_audio_features`` computes exact sample
statistics through the same Arrow-batched ``mapInPandas`` seam — while
compressed audio (mp3/opus/flac) stays behind the documented
NotImplementedError plug point where ffmpeg-class libraries would go.

Subset: canonical RIFF/WAVE files, PCM format 1, 16-bit samples, any
channel count/rate.  Everything else raises ValueError — the per-row
failure surface the caller converts to a null feature row.
"""

from __future__ import annotations

import struct

__all__ = ["encode_wav", "decode_wav"]


def encode_wav(sample_rate: int, n_channels: int, samples: list[int]) -> bytes:
    """Interleaved int16 samples -> canonical 16-bit PCM WAV bytes."""
    if len(samples) % n_channels:
        raise ValueError("sample count not a multiple of channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Parse PCM16 WAV -> ``(sample_rate, n_channels, samples)`` with
    samples interleaved int16.  Rejects non-RIFF payloads, compressed
    formats, and non-16-bit depths."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = n_channels = None
    frames = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated WAV chunk")
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, n_channels, sample_rate, _br, _ba, depth = (
                struct.unpack_from("<HHIIHH", body)
            )
            if fmt_code != 1:
                raise ValueError(
                    f"compressed WAV format {fmt_code} needs a codec "
                    "library (the documented multimodal plug point)"
                )
            if depth != 16:
                raise ValueError(f"unsupported WAV bit depth {depth}")
        elif tag == b"data":
            frames = body
    if sample_rate is None:
        raise ValueError("WAV missing fmt chunk")
    if frames is None:
        raise ValueError("WAV missing data chunk")
    if len(frames) % 2:
        raise ValueError("odd PCM16 data length")
    samples = list(struct.unpack(f"<{len(frames) // 2}h", frames))
    if n_channels and len(samples) % n_channels:
        raise ValueError("sample count not a multiple of channel count")
    return sample_rate, n_channels, samples
