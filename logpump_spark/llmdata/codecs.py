"""Pure-stdlib media codecs: PNG (zlib + struct) and WAV (struct).

The container has no pillow/soundfile, but a REAL decode of the two
formats that matter for deterministic testing needs nothing beyond the
standard library: PNG is zlib-compressed filtered scanlines behind CRC'd
chunks, WAV is a RIFF header around PCM samples.  These codecs make
``strict=True`` a genuinely exercised path — the decoder parses real
bytes, inflates real zlib streams, unfilters real scanlines — while
remaining dependency-free.  PIL/soundfile, when present, still take
precedence in the feature extractors (they cover many more formats).

Encoders exist so tests and oracle-checked queries can SYNTHESIZE real
payloads with known properties; they are not a general-purpose imaging
library (8-bit L/RGB/RGBA, non-interlaced; PCM16 mono WAV).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_MODE_CHANNELS = {"L": 1, "RGB": 3, "RGBA": 4}
_COLOR_TYPE_TO_MODE = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_MODE_TO_COLOR_TYPE = {"L": 0, "RGB": 2, "RGBA": 6}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, mode: str = "L", pixel=None) -> bytes:
    """Minimal PNG encoder: 8-bit depth, filter 0 scanlines, one IDAT.

    ``pixel(x, y, c)`` supplies each channel byte; defaults to a
    deterministic gradient so payloads are reproducible."""
    if mode not in _MODE_CHANNELS:
        raise ValueError(f"unsupported mode {mode!r}")
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    nch = _MODE_CHANNELS[mode]
    if pixel is None:
        pixel = lambda x, y, c: (x * 7 + y * 13 + c * 29) % 256  # noqa: E731
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 (None)
        for x in range(width):
            for c in range(nch):
                raw.append(pixel(x, y, c) & 0xFF)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _MODE_TO_COLOR_TYPE[mode], 0, 0, 0
    )
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> dict:
    """Full PNG decode: chunk walk with CRC verification, IHDR parse,
    IDAT inflate, scanline unfilter (all five filter types).

    Returns {width, height, mode, bit_depth, pixels (bytes, unfiltered,
    row-major), mean_pixel}.  Supports the encoder's envelope plus
    whatever else is 8-bit non-interlaced; anything beyond raises
    ValueError (callers fall back or fail strictly)."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    mode = _COLOR_TYPE_TO_MODE.get(color_type)
    if mode is None:
        raise ValueError(f"unknown color type {color_type}")
    if bit_depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNGs supported")
    nch = {"L": 1, "RGB": 3, "P": 1, "LA": 2, "RGBA": 4}[mode]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size mismatch")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                ul = prev[i - nch] if i >= nch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out.extend(line)
        prev = line
    mean_pixel = sum(out) / len(out) if out else 0.0
    return {
        "width": width,
        "height": height,
        "mode": mode,
        "bit_depth": bit_depth,
        "pixels": bytes(out),
        "mean_pixel": mean_pixel,
    }


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Minimal PCM16 mono WAV encoder.  Total size is deterministic:
    44 header bytes + 2 bytes per sample."""
    n = len(samples)
    data = struct.pack(f"<{n}h", *[max(-32768, min(32767, s)) for s in samples])
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE parse: fmt + data chunk walk.

    Returns {sample_rate, channels, bits, n_samples, duration_ms,
    samples (list[int], only for PCM16)}."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if block_align == 0:
        raise ValueError("zero block align")
    n_samples = len(data) // block_align
    samples = (
        list(struct.unpack(f"<{n_samples}h", data[: n_samples * 2]))
        if audio_format == 1 and bits == 16 and channels == 1
        else []
    )
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // sample_rate if sample_rate else 0,
        "samples": samples,
    }
