"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs.

The Ray-side plumbing (schemas, actor-pool stages, batch sizing, output
layout) is real and tested.  The decode path is now REAL for
self-describing formats (netpbm P5/P6, uncompressed BMP, PCM-16 WAV —
see ``imagecodec.py``: pure header parse + ``np.frombuffer``, no
external library).  Compressed formats (PNG/JPEG, MP3/AAC) still need
PIL/libav, which are not in this container: those payloads fall back to
a clearly-marked deterministic fake (or ``NotImplementedError`` in
strict mode), so swapping in PIL/libav on a real cluster changes
nothing structural.

Batch-size guidance (SURVEY.md 'Memory-aware'): binary payloads are
large — pair these stages with a small ``batch_size`` (e.g. 64) and
``concurrency`` sized so batch × pool fits worker heap.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import imagecodec

IMAGE_META_TYPE = pa.struct(
    [
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
    ]
)

AUDIO_META_TYPE = pa.struct(
    [
        ("codec", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("channels", pa.int32()),
    ]
)


def _fake_pixels(data: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Deterministic stand-in decode: pixels derived from the payload
    digest — stable across runs/processes, shaped like a real decode."""
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


class ImageDecode:
    """Actor-pool stage: ``binary`` image column → fixed-size uint8
    tensor column (decode + resize fused).  Decode priority per payload:
    PIL when available (any format) → pure-numpy codec for netpbm/BMP
    (``imagecodec.decode_image`` — a real decode, no library needed) →
    deterministic fake (or strict=True → NotImplementedError, marking
    the compressed-codec gap explicitly)."""

    def __init__(
        self,
        *,
        bytes_col: str = "image",
        meta_col: str | None = "image_meta",
        out_col: str = "pixels",
        size: tuple[int, int] = (32, 32),
        strict: bool = False,
    ):
        self.bytes_col = bytes_col
        self.meta_col = meta_col
        self.out_col = out_col
        self.size = size
        self.strict = strict
        try:  # real decoder, once per actor
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode_one(self, data: bytes) -> np.ndarray:
        h, w = self.size
        if self._pil is not None:
            import io

            img = self._pil.open(io.BytesIO(data)).convert("RGB").resize((w, h))
            return np.asarray(img, dtype=np.uint8)
        try:
            px = imagecodec.decode_image(data)  # real decode: ppm/pgm/bmp
        except Exception:
            # magic matched but the payload is malformed/truncated:
            # strict surfaces it, non-strict degrades per row (one bad
            # blob must not abort the whole map_batches job)
            if self.strict:
                raise
            px = None
        if px is not None:
            if px.shape[2] == 1:  # gray → RGB
                px = np.repeat(px, 3, axis=2)
            return imagecodec.resize_nearest(px, (h, w))
        if self.strict:
            raise NotImplementedError(
                "compressed image codec not available in this environment "
                "(PIL missing); netpbm/BMP payloads decode natively; run "
                "with strict=False for the deterministic stub on others"
            )
        return _fake_pixels(data, h, w, 3)

    def __call__(self, t: pa.Table) -> pa.Table:
        h, w = self.size
        tensors = [
            None if v is None else self._decode_one(v)
            for v in t[self.bytes_col].to_pylist()
        ]
        flat = pa.array(
            [None if x is None else x.reshape(-1) for x in tensors],
            type=pa.list_(pa.uint8(), h * w * 3),
        )
        return t.append_column(self.out_col, flat)


class ImageFeatures:
    """Actor-pool stage: pixel tensors → small float feature vector
    (channel means/stds — a stand-in for a real model forward pass; the
    model-load-once-per-actor shape is what matters)."""

    def __init__(self, *, pixels_col: str = "pixels", out_col: str = "features",
                 size: tuple[int, int] = (32, 32)):
        self.pixels_col = pixels_col
        self.out_col = out_col
        self.size = size

    def __call__(self, t: pa.Table) -> pa.Table:
        h, w = self.size
        col = t[self.pixels_col].combine_chunks()
        # fixed-size lists keep child slots for null rows too, so one
        # reshape covers the whole batch; null rows are masked after
        px = np.asarray(col.values, dtype=np.float32).reshape(-1, h * w, 3)
        feats = np.concatenate(
            [px.mean(axis=1), px.std(axis=1)], axis=1
        ) / np.float32(255.0)
        flat = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), 6
        )
        if col.null_count:
            flat = pc.if_else(pc.is_null(col), None, flat)
        return t.append_column(self.out_col, flat)


class AudioFrameSample:
    """Actor-pool stage: ``binary`` audio column → per-frame RMS energy
    over ``n_frames`` equal segments.  PCM-16 WAV payloads decode for
    real (``imagecodec.decode_wav`` — chunk walk + ``np.frombuffer``);
    compressed codecs (MP3/AAC — libav absent) fall back to the
    deterministic fake, or raise in strict mode."""

    def __init__(self, *, bytes_col: str = "audio", n_frames: int = 8,
                 strict: bool = False):
        self.bytes_col = bytes_col
        self.n_frames = n_frames
        self.strict = strict

    def _energies_one(self, v: bytes) -> list[float]:
        if imagecodec.sniff_format(v) == "wav":
            try:
                samples, _rate = imagecodec.decode_wav(v)
            except Exception:
                if self.strict:
                    raise
                return self._fake_energies(v)
            mono = samples.astype(np.float64).mean(axis=1) / 32768.0
            # RMS per equal-width frame; empty frames (clip shorter than
            # n_frames samples) report 0.
            edges = np.linspace(0, len(mono), self.n_frames + 1).astype(np.int64)
            sq = np.concatenate([[0.0], np.cumsum(mono * mono)])
            counts = np.diff(edges)
            sums = sq[edges[1:]] - sq[edges[:-1]]
            with np.errstate(invalid="ignore", divide="ignore"):
                rms = np.sqrt(np.where(counts > 0, sums / np.maximum(counts, 1), 0.0))
            return rms.tolist()
        if self.strict:
            raise NotImplementedError(
                "compressed audio codec not available (no libav); PCM WAV "
                "payloads decode natively"
            )
        return self._fake_energies(v)

    def _fake_energies(self, v: bytes) -> list[float]:
        # deterministic fake: frame energies from payload digest chunks
        d = hashlib.sha256(v).digest()
        return [d[i % 32] / 255.0 for i in range(self.n_frames)]

    def __call__(self, t: pa.Table) -> pa.Table:
        energies = [
            None if v is None else self._energies_one(v)
            for v in t[self.bytes_col].to_pylist()
        ]
        return t.append_column(
            "frame_energy",
            pa.array(energies, type=pa.list_(pa.float64(), self.n_frames)),
        )


class VideoFrameSample:
    """Actor-pool stage: ``binary`` video column → ``n_frames`` evenly
    sampled, resized frame tensors plus the true frame count.

    Concatenated-PPM streams (ffmpeg's ``image2pipe``/``ppm`` output)
    decode for REAL — header walk finds frame boundaries, only sampled
    frames' pixels are touched (``imagecodec.decode_ppm_stream``).
    Container formats (MP4/MKV — libav absent) fall back to the
    deterministic fake, or raise in strict mode.

    Output columns: ``frames`` fixed_size_list<uint8, n*h*w*3> and
    ``frame_count`` int32 (-1 when the fake path ran)."""

    def __init__(self, *, bytes_col: str = "video", n_frames: int = 4,
                 size: tuple[int, int] = (16, 16), strict: bool = False):
        self.bytes_col = bytes_col
        self.n_frames = n_frames
        self.size = size
        self.strict = strict

    def _sample_one(self, data: bytes) -> tuple[np.ndarray, int]:
        h, w = self.size
        if data[:2] in (b"P5", b"P6"):
            try:
                frames, total = imagecodec.decode_ppm_stream(
                    data, self.n_frames
                )
            except Exception:
                # malformed/truncated stream: degrade per row unless strict
                if self.strict:
                    raise
                return self._fake_frames(data), -1
            out = []
            for px in frames:
                if px.shape[2] == 1:
                    px = np.repeat(px, 3, axis=2)
                out.append(imagecodec.resize_nearest(px, (h, w)))
            while len(out) < self.n_frames:  # clip shorter than n_frames
                out.append(out[-1])
            return np.stack(out), total
        if self.strict:
            raise NotImplementedError(
                "container video codec not available (no libav); "
                "concatenated-PPM streams decode natively"
            )
        return self._fake_frames(data), -1

    def _fake_frames(self, data: bytes) -> np.ndarray:
        h, w = self.size
        return _fake_pixels(data, self.n_frames * h, w, 3).reshape(
            self.n_frames, h, w, 3
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        h, w = self.size
        tensors, counts = [], []
        for v in t[self.bytes_col].to_pylist():
            if v is None:
                tensors.append(None)
                counts.append(None)
                continue
            frames, total = self._sample_one(v)
            tensors.append(frames.reshape(-1))
            counts.append(total)
        flat = pa.array(
            [None if x is None else x for x in tensors],
            type=pa.list_(pa.uint8(), self.n_frames * h * w * 3),
        )
        t = t.append_column("frames", flat)
        return t.append_column("frame_count", pa.array(counts, pa.int32()))


def attach_image_meta(t: pa.Table, *, bytes_col: str = "image") -> pa.Table:
    """Typed metadata struct for a binary image column.  For
    self-describing formats (netpbm/BMP) the width/height/channels come
    from a REAL header parse; unknown/compressed payloads get
    ``format=None`` dims ``-1`` (honest 'unparsed' marker, not a fake
    header)."""
    metas = []
    for v in t[bytes_col].to_pylist():
        if v is None:
            metas.append(None)
            continue
        kind = imagecodec.sniff_format(v)
        try:
            if kind in ("ppm", "pgm"):
                _, w, h, _maxval, _off = imagecodec._pnm_header(v)
                metas.append({"format": kind, "width": w, "height": h,
                              "channels": 3 if kind == "ppm" else 1})
                continue
            if kind == "bmp":
                w, h_signed = struct.unpack_from("<ii", v, 18)
                metas.append({"format": "bmp", "width": w,
                              "height": abs(h_signed), "channels": 3})
                continue
        except Exception:
            pass  # magic matched, header unparseable → honest marker below
        metas.append({"format": kind, "width": -1, "height": -1,
                      "channels": -1})
    return t.append_column("image_meta", pa.array(metas, type=IMAGE_META_TYPE))
