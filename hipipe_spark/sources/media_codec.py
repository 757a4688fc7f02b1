"""Pure-stdlib media codecs: PNG (zlib) and WAV (wave).

Real decode for the multimodal column plumbing (``sources/multimodal.py``)
without adding any dependency: PNG is parsed chunk-by-chunk per the
public spec (RFC 2083 / W3C PNG) with full filter reconstruction
(None/Sub/Up/Average/Paeth), WAV goes through the stdlib ``wave``
module. Encoders exist so tests and the deterministic media generator
can synthesise REAL decodable bytes at small scale (task contract: no
external data).

Scope, stated plainly: 8-bit greyscale (color type 0) and 8-bit RGB
(color type 2), non-interlaced — the subset the generator emits and the
decoder round-trips. PCM 16-bit WAV, any channel count. Video has no
stdlib codec; it stays metadata-only (disclosed in multimodal.py).

These helpers run INSIDE Arrow-batched ``mapInPandas`` workers — pure
functions of ``bytes``, no Spark imports, so the module is importable on
executors with zero extra state.
"""

from __future__ import annotations

import struct
import wave
import zlib
from io import BytesIO

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(width: int, height: int, pixels: bytes, channels: int = 1,
               filter_type: int = 0) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels``
    bytes) as a valid PNG. ``filter_type`` selects the per-row filter
    written (0..4) — useful for pinning the decoder's reconstruction of
    every filter in tests; 0 (None) is the production default."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (grey) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}")
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride, bpp = width * channels, channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        else:
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if filter_type == 1:
                    pred = a
                elif filter_type == 2:
                    pred = b
                elif filter_type == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                raw.append((row[i] - pred) & 0xFF)
        prev = row
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _reconstruct(raw: bytes, width: int, height: int,
                 channels: int) -> bytes:
    """Undo per-scanline PNG filters on a decompressed IDAT/fdAT
    payload → raw row-major pixels."""
    stride, bpp = width * channels, channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter type {ft}")
        out[y * stride:(y + 1) * stride] = line
        prev = bytes(line)
    return bytes(out)


def _parse_chunks(data: bytes):
    """Yield (tag, body) for each chunk; validates signature and
    per-chunk truncation."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # skip CRC
        yield tag, body
        if tag == b"IEND":
            return


def _parse_ihdr(body: bytes) -> tuple[int, int, int]:
    width, height, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", body)
    if depth != 8 or color not in (0, 2) or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} color={color} "
            f"interlace={interlace}")
    return width, height, 1 if color == 0 else 3


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixels)`` with full
    filter reconstruction. Supports 8-bit color types 0 (grey) and 2
    (RGB), non-interlaced — raises ``ValueError`` on anything else or on
    a malformed stream (truncation, bad signature, size mismatch)."""
    dims = None
    idat = bytearray()
    for tag, body in _parse_chunks(data):
        if tag == b"IHDR":
            dims = _parse_ihdr(body)
        elif tag == b"IDAT":
            idat += body
    if dims is None:
        raise ValueError("no IHDR")
    width, height, channels = dims
    pixels = _reconstruct(zlib.decompress(bytes(idat)), width, height,
                          channels)
    return width, height, channels, pixels


def _filter_rows(width: int, height: int, pixels: bytes,
                 channels: int) -> bytes:
    """Serialize pixels as filter-0 scanlines (the encode inverse of
    :func:`_reconstruct` for the production default)."""
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride:(y + 1) * stride]
    return bytes(raw)


def apng_encode(width: int, height: int, frames: list[bytes],
                channels: int = 1, delay_num: int = 1,
                delay_den: int = 10) -> bytes:
    """Encode full-size frames as an APNG (the public Animated-PNG
    spec): IHDR + acTL(num_frames) + per-frame fcTL, frame 0 in IDAT,
    frames 1+ in fdAT with running sequence numbers. All frames share
    the canvas (x=y=0, dispose/blend 0) and one delay."""
    if not frames:
        raise ValueError("need at least one frame")
    for fr in frames:
        if len(fr) != width * height * channels:
            raise ValueError("frame buffer size mismatch")
    color_type = 0 if channels == 1 else 2
    out = bytearray(_PNG_SIG)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8,
                                       color_type, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for fi, fr in enumerate(frames):
        fctl = struct.pack(">IIIIIHHBB", seq, width, height, 0, 0,
                           delay_num, delay_den, 0, 0)
        out += _chunk(b"fcTL", fctl)
        seq += 1
        comp = zlib.compress(_filter_rows(width, height, fr, channels), 6)
        if fi == 0:
            out += _chunk(b"IDAT", comp)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + comp)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def apng_decode(data: bytes) -> tuple[int, int, int, list[bytes], float]:
    """Decode an APNG → ``(width, height, channels, frames,
    frame_delay_ms)``. Full-size frames only (x=y=0, frame dims ==
    canvas — the subset the encoder emits; offset frames raise).
    A plain PNG (no acTL) decodes as a single frame with delay 0."""
    dims = None
    n_frames = None
    delay_ms = 0.0
    cur = bytearray()
    frames_raw: list[bytes] = []
    saw_fctl = False
    for tag, body in _parse_chunks(data):
        if tag == b"IHDR":
            dims = _parse_ihdr(body)
        elif tag == b"acTL":
            n_frames = struct.unpack(">II", body)[0]
        elif tag == b"fcTL":
            (_seq, fw, fh, x, y, dnum, dden, _disp, _blend) = struct.unpack(
                ">IIIIIHHBB", body)
            if dims is None:
                raise ValueError("fcTL before IHDR")
            if (fw, fh, x, y) != (dims[0], dims[1], 0, 0):
                raise ValueError("offset/partial APNG frames unsupported")
            delay_ms = 1000.0 * dnum / (dden or 100)
            if saw_fctl and cur:
                frames_raw.append(bytes(cur))
                cur = bytearray()
            saw_fctl = True
        elif tag == b"IDAT":
            cur += body
        elif tag == b"fdAT":
            cur += body[4:]  # strip the sequence number
    if dims is None:
        raise ValueError("no IHDR")
    if cur:
        frames_raw.append(bytes(cur))
    width, height, channels = dims
    frames = [_reconstruct(zlib.decompress(fr), width, height, channels)
              for fr in frames_raw]
    if n_frames is not None and len(frames) != n_frames:
        raise ValueError(
            f"acTL declared {n_frames} frames, stream has {len(frames)}")
    return width, height, channels, frames, delay_ms


def png_thumbnail(width: int, height: int, channels: int, pixels: bytes,
                  tw: int, th: int) -> tuple[int, int, bytes]:
    """Nearest-neighbour downsample to at most ``tw x th`` preserving
    aspect ratio (never upscales); returns (w, h, re-encoded PNG)."""
    scale = min(tw / width, th / height, 1.0)
    ow, oh = max(1, int(width * scale)), max(1, int(height * scale))
    stride = width * channels
    buf = bytearray(ow * oh * channels)
    for y in range(oh):
        sy = min(height - 1, y * height // oh)
        for x in range(ow):
            sx = min(width - 1, x * width // ow)
            s = sy * stride + sx * channels
            d = (y * ow + x) * channels
            buf[d:d + channels] = pixels[s:s + channels]
    return ow, oh, png_encode(ow, oh, bytes(buf), channels)


def wav_encode(samples: list[int], rate: int = 8000,
               channels: int = 1) -> bytes:
    """PCM-16 WAV bytes from integer samples (interleaved if
    multi-channel); values are clamped to int16 range."""
    bio = BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        clamped = [max(-32768, min(32767, int(s))) for s in samples]
        w.writeframes(struct.pack(f"<{len(clamped)}h", *clamped))
    return bio.getvalue()


def wav_decode(data: bytes) -> tuple[int, int, int, list[int]]:
    """Decode PCM-16 WAV → ``(rate, channels, n_frames, samples)``."""
    with wave.open(BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"unsupported sample width {w.getsampwidth()}")
        rate, channels, n = w.getframerate(), w.getnchannels(), w.getnframes()
        pcm = w.readframes(n)
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return rate, channels, n, samples
