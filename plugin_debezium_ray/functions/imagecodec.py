"""Pure-numpy codecs for the formats that need no external library:
PPM/PGM (netpbm P5/P6) and uncompressed 24-bit BMP images, and PCM
16-bit WAV audio.

These make the multimodal stages REAL for self-describing formats even
in a container with no PIL/libav: the multimodal pipeline's decode path
is header parsing + one ``np.frombuffer`` reshape — genuinely the full
decode for these formats, not a stub.  Compressed formats (PNG/JPEG,
MP3/AAC) still require the external libraries and fall back to the
labeled deterministic fake / strict error in ``multimodal.py``.

Format references are the public specs: netpbm (P5/P6 headers),
Windows BITMAPINFOHEADER (BI_RGB, bottom-up rows, 4-byte row padding),
RIFF/WAVE (fmt/data chunks, PCM format tag 1).
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_format(data: bytes) -> str | None:
    """Best-effort container sniff from magic bytes: one of
    ``"ppm" | "pgm" | "bmp" | "wav" | "png" | "jpeg"`` or None."""
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"P5":
        return "pgm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return None


# ------------------------------------------------------------- netpbm


def _pnm_header(
    data: bytes, start: int = 0
) -> tuple[bytes, int, int, int, int]:
    """Parse a P5/P6 header at ``start``: (magic, width, height, maxval,
    data_offset) with ``data_offset`` relative to ``start``.
    Whitespace-separated tokens; ``#`` comments run to end-of-line.
    The offset parameter lets stream walkers avoid copying the
    remaining buffer per frame."""
    pos = start + 2
    vals: list[int] = []
    n = len(data)
    while len(vals) < 3:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if pos < n and data[pos : pos + 1] == b"#":
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        tok_start = pos
        while pos < n and not data[pos : pos + 1].isspace():
            pos += 1
        if tok_start == pos:
            raise ValueError("truncated netpbm header")
        vals.append(int(data[tok_start:pos]))
    # one whitespace byte after maxval; offset is relative to `start`
    return data[start : start + 2], vals[0], vals[1], vals[2], pos + 1 - start


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 (binary RGB) → (h, w, 3) uint8; P5 (binary gray) → (h, w, 1)."""
    magic, w, h, maxval, off = _pnm_header(data)
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    c = 3 if magic == b"P6" else 1
    need = w * h * c
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    return px.reshape(h, w, c)


def encode_ppm(px: np.ndarray) -> bytes:
    """(h, w, 3) or (h, w, 1) / (h, w) uint8 → P6/P5 bytes (fixture +
    round-trip helper)."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


# ---------------------------------------------------------------- bmp


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed BI_RGB 24/32-bit BMP → (h, w, 3) uint8 RGB.
    Handles bottom-up (positive height) and top-down rows and the
    4-byte row padding of the 24-bit layout."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs not supported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    bottom_up = h_signed > 0
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pixel_off
    ).reshape(h, stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if bottom_up:
        px = px[::-1]
    # BGR(A) → RGB
    return px[:, :, 2::-1].copy()


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP bytes."""
    px = np.asarray(px, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3)")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    pixel_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", pixel_off + len(body), 0, 0, pixel_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return header + body


# ---------------------------------------------------------------- wav


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM 16-bit RIFF/WAVE → ((n_samples, channels) int16, sample_rate).
    Walks the chunk list (fmt may not be first; LIST/INFO chunks skip)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    pcm = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", data, body)
        elif cid == b"data":
            pcm = data[body : body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(pcm, dtype="<i2")
    usable = (len(samples) // channels) * channels
    return samples[:usable].reshape(-1, channels), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) int16 → PCM WAV bytes (fixture + round-trip)."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    body = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ------------------------------------------------- ppm video streams
#
# A "video" here is a stream of concatenated binary netpbm frames —
# exactly what ``ffmpeg -f image2pipe -vcodec ppm`` produces.  Each
# frame is self-describing, so frame boundaries come from header walks
# (cheap: a few bytes per frame) and only SAMPLED frames are decoded.


def ppm_stream_offsets(data: bytes) -> list[tuple[int, int, int, int]]:
    """Walk a concatenated P5/P6 stream → one (payload_offset, width,
    height, channels) tuple per frame, decoding no pixel data."""
    frames = []
    pos = 0
    n = len(data)
    while pos < n:
        magic = data[pos : pos + 2]
        if magic not in (b"P5", b"P6"):
            raise ValueError(f"bad frame magic at offset {pos}: {magic!r}")
        _, w, h, maxval, off = _pnm_header(data, pos)
        if maxval > 255:
            raise ValueError("16-bit netpbm not supported")
        c = 3 if magic == b"P6" else 1
        frames.append((pos + off, w, h, c))
        pos += off + w * h * c
    return frames


def decode_ppm_stream(
    data: bytes, sample: int | None = None
) -> tuple[list[np.ndarray], int]:
    """Concatenated-PPM video → (decoded frames, total frame count).
    With ``sample=k``, only k evenly-spaced frames are decoded (first
    and last included for k >= 2); pixel bytes of skipped frames are
    never touched."""
    offsets = ppm_stream_offsets(data)
    total = len(offsets)
    if sample is None or sample >= total:
        idx = range(total)
    elif sample <= 1:
        idx = [0]
    else:
        idx = np.round(np.linspace(0, total - 1, sample)).astype(int).tolist()
    out = []
    for i in idx:
        off, w, h, c = offsets[i]
        px = np.frombuffer(data, dtype=np.uint8, count=w * h * c, offset=off)
        out.append(px.reshape(h, w, c))
    return out, total


def encode_ppm_stream(frames: list[np.ndarray]) -> bytes:
    """Frame arrays → concatenated-PPM bytes (fixture + round-trip)."""
    return b"".join(encode_ppm(f) for f in frames)


# ------------------------------------------------------------- resize


def resize_nearest(px: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """(h, w, c) → (H, W, c) nearest-neighbor resample (pure index math,
    deterministic — the resize used when PIL is absent)."""
    H, W = size
    h, w = px.shape[:2]
    ri = (np.arange(H) * h // H).clip(0, h - 1)
    ci = (np.arange(W) * w // W).clip(0, w - 1)
    return px[ri][:, ci]


def decode_image(data: bytes) -> np.ndarray | None:
    """Decode any pure-parseable image payload → (h, w, c) uint8, or
    None when only an external codec could decode it (png/jpeg/...)."""
    kind = sniff_format(data)
    if kind in ("ppm", "pgm"):
        return decode_ppm(data)
    if kind == "bmp":
        return decode_bmp(data)
    return None
