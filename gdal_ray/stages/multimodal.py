"""Multimodal (image/audio/video) column stages.

Binary media are opaque Arrow ``binary`` columns with typed metadata
(mime, width/height, sample rate ...), exactly like the `html` payload:
wide blobs stay out of shuffles, per-item work runs in actor-pool
``map_batches`` stages sized by payload bytes, not row count.

The decode kernels themselves are STUBBED behind ``decoder=`` hooks —
image/audio codecs are not available in this environment — but the
Ray-side plumbing (schemas, batch sizing, actor signature, output
layout) is real and tested:

- ``decode_stage``: binary → fixed-shape float tensor column (image
  decode/resize or audio resample); deterministic fake decoder default.
- ``feature_stage``: tensor column → embedding ``list<float>`` (the
  "model inference" slot: the model handle loads once per actor in
  ``__init__``, work happens per batch).
- ``frame_sample_stage``: video-style binary → N sampled frames per
  row (flat_map shape: one output row per frame).

Batch sizing: media rows are MBs — ``batch_size`` defaults are small
and explicit, and the stages run as actor pools so a decoder/model
loads once per worker (SURVEY.md §2.3 stateful-stage rule).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

from ._pool import autoscale as _autoscale

IMAGE_SHAPE = (32, 32, 3)  # deterministic-fake decode target (H, W, C)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public PRNG, Steele et al.)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30)))
         * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27)))
         * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def fake_decode_batch(blobs: list, shape=IMAGE_SHAPE) -> np.ndarray:
    """Vectorized deterministic stand-in for a batched image
    decode+resize: one sha256 per blob seeds a counter-based splitmix64
    stream expanded into float32 tensors in [0, 1) — a single numpy
    pass over the whole batch (the per-row RandomState loop this
    replaces dominated media_decode_embed's wall time)."""
    n = int(np.prod(shape))
    seeds = np.array(
        [int.from_bytes(hashlib.sha256(b or b"").digest()[:8], "little")
         for b in blobs], dtype=np.uint64)
    ctr = seeds[:, None] + np.arange(n, dtype=np.uint64)[None, :]
    bits = _splitmix64(ctr)
    vals = (bits >> np.uint64(40)).astype(np.float32) \
        * np.float32(1.0 / (1 << 24))
    return vals.reshape((len(blobs),) + tuple(shape))


def fake_image_decoder(blob: bytes, shape=IMAGE_SHAPE) -> np.ndarray:
    """Single-item view of ``fake_decode_batch`` (the per-row decoder
    slot a real codec plugs into; real codecs are per-image)."""
    return fake_decode_batch([blob], shape)[0]


def real_image_decoder(blob: bytes, shape=IMAGE_SHAPE) -> np.ndarray:
    """The production slot: decode with PIL and resize.  Raises when the
    codec stack is absent (this container)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image codecs not available in this environment; use the "
            "deterministic fake decoder or install Pillow") from e
    raise NotImplementedError("wire PIL decode here")  # pragma: no cover


class MediaDecoder:
    """Actor callable: binary column → flattened float32 tensor column
    (fixed_size_list) + shape metadata columns."""

    def __init__(self, media_col: str = "media", out: str = "tensor",
                 shape=IMAGE_SHAPE, decoder=None):
        self.media_col, self.out = media_col, out
        self.shape = tuple(shape)
        self.n = int(np.prod(shape))
        self.decoder = decoder  # None → vectorized fake batch decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.media_col].to_pylist()
        if self.decoder is None:
            # vectorized fake: one numpy pass over the whole batch
            flat = fake_decode_batch(blobs, self.shape) \
                .reshape(len(blobs), self.n)
        else:
            # real codec slot: per-image APIs force the row loop
            flat = np.empty((len(blobs), self.n), dtype=np.float32)
            for i, b in enumerate(blobs):
                flat[i] = self.decoder(b or b"", self.shape).ravel()
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.ravel(), pa.float32()), self.n)
        out = batch.drop_columns([self.media_col])
        out = out.append_column(self.out, arr)
        return out.append_column(
            "tensor_shape",
            pa.array([list(self.shape)] * len(blobs),
                     pa.list_(pa.int32())))


def decode_stage(ds, media_col: str = "media", out: str = "tensor",
                 shape=IMAGE_SHAPE, decoder=None, concurrency=None,
                 batch_size: int = 64):
    """binary media → tensor column.  batch_size is small by design:
    batch bytes = batch_size × media size must fit the worker heap."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs=dict(media_col=media_col, out=out,
                                   shape=shape, decoder=decoder),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_autoscale(concurrency))


class FeatureExtractor:
    """Actor callable: tensor column → embedding list<float> — the model
    slot.  The "model" (a fixed random projection, seeded: deterministic
    across workers) loads once per actor; swap ``project`` for a real
    forward pass."""

    def __init__(self, tensor_col: str = "tensor", out: str = "embedding",
                 in_dim: int = int(np.prod(IMAGE_SHAPE)), dim: int = 64,
                 seed: int = 11):
        rs = np.random.RandomState(seed)
        self.W = (rs.normal(size=(in_dim, dim)) / np.sqrt(in_dim)) \
            .astype(np.float32)
        self.tensor_col, self.out = tensor_col, out

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.tensor_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float32).reshape(len(batch), -1)
        emb = flat @ self.W
        out = batch.drop_columns([self.tensor_col])
        return out.append_column(self.out, pa.array(emb.tolist(),
                                                    pa.list_(pa.float32())))


def feature_stage(ds, tensor_col: str = "tensor", out: str = "embedding",
                  dim: int = 64, concurrency=None, batch_size: int = 256,
                  in_dim: int = int(np.prod(IMAGE_SHAPE))):
    return ds.map_batches(
        FeatureExtractor,
        fn_constructor_kwargs=dict(tensor_col=tensor_col, out=out,
                                   dim=dim, in_dim=in_dim),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=_autoscale(concurrency))


def frame_sample_stage(ds, media_col: str = "media", n_frames: int = 4,
                       key_col: str = "url", batch_size: int = 16):
    """Video-style frame sampling: one output row per (item, frame).
    The fake "container" treats the blob as zlib-chunked frames; a real
    implementation swaps in pyav/ffmpeg keyframe extraction."""

    def sample(batch: pa.Table) -> pa.Table:
        keys, frames, idxs = [], [], []
        for k, blob in zip(batch[key_col].to_pylist(),
                           batch[media_col].to_pylist()):
            blob = blob or b""
            step = max(1, len(blob) // n_frames)
            for f in range(n_frames):
                chunk = blob[f * step:(f + 1) * step]
                keys.append(k)
                idxs.append(f)
                frames.append(zlib.compress(chunk, 1))
        return pa.table({
            key_col: pa.array(keys),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })

    return ds.map_batches(sample, batch_format="pyarrow",
                          batch_size=batch_size)


def audio_window_stage(ds, media_col: str = "media", key_col: str = "url",
                       window_bytes: int = 4096, hop_bytes: int = 2048,
                       batch_size: int = 64):
    """Audio-style sliding-window chunking: one output row per
    (item, window) with overlapping hops — the layout a Whisper-style
    batched-inference stage consumes.  The blob is treated as the raw
    PCM byte stream (a real implementation swaps in soundfile/ffmpeg
    decoding upstream); windows shorter than ``window_bytes`` at the
    tail are kept and zero-padded by the consumer."""

    def windows(batch: pa.Table) -> pa.Table:
        keys, idxs, chunks, lens = [], [], [], []
        for k, blob in zip(batch[key_col].to_pylist(),
                           batch[media_col].to_pylist()):
            blob = blob or b""
            pos, w = 0, 0
            while pos < len(blob) or w == 0:
                chunk = blob[pos:pos + window_bytes]
                keys.append(k)
                idxs.append(w)
                chunks.append(chunk)
                lens.append(len(chunk))
                pos += hop_bytes
                w += 1
                if not blob:
                    break
        return pa.table({
            key_col: pa.array(keys),
            "window_idx": pa.array(idxs, pa.int32()),
            "n_bytes": pa.array(lens, pa.int64()),
            "window": pa.array(chunks, pa.binary()),
        })

    return ds.map_batches(windows, batch_format="pyarrow",
                          batch_size=batch_size)
