"""Multimodal (image/audio/video) processing plumbing.

Media ride as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches`` stages.
The image/audio codec libraries are NOT available in this container, so the
codec core is stubbed: ``decoder='stub'`` raises ``NotImplementedError`` with
install guidance, while ``decoder='fake'`` produces a deterministic
hash-derived payload so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested end-to-end.

Batch-size guidance: media rows are KB-MB each; size ``batch_size`` by bytes
(e.g. 32-256 rows), keep ``batch_format='pyarrow'`` so binary payloads stay
zero-copy, and give each decode actor ``num_cpus>=1``.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    pa.field('media_id', pa.string()),
    pa.field('payload', pa.binary()),
    pa.field('mime_type', pa.string()),
    pa.field('width', pa.int32()),
    pa.field('height', pa.int32()),
    pa.field('duration_ms', pa.int32()),
])


def _fake_pixels(payload: bytes, width: int, height: int, channels: int = 3) -> np.ndarray:
    """Deterministic pseudo-decode: pixels derived from the payload hash."""
    seed = int.from_bytes(hashlib.sha256(payload or b'').digest()[:8], 'little')
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


class ImageDecode:
    """payload(binary) -> decoded pixel tensor (list<uint8> flattened) + dims."""

    def __init__(self, payload_column: str = 'payload', decoder: str = 'stub',
                 target_size: Tuple[int, int] = (32, 32)) -> None:
        if decoder not in ('stub', 'fake'):
            raise ValueError(f'Unknown decoder: {decoder}')
        self.payload_column = payload_column
        self.decoder = decoder
        self.target_size = target_size

    def decode_one(self, payload: bytes) -> np.ndarray:
        if self.decoder == 'stub':
            raise NotImplementedError(
                'Image codecs are not available in this environment; install Pillow/opencv '
                "and register a real decoder, or use decoder='fake' for plumbing tests.")
        w, h = self.target_size
        return _fake_pixels(payload, w, h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels = [self.decode_one(p) for p in batch.column(self.payload_column).to_pylist()]
        flat = pa.array([p.reshape(-1) for p in pixels], pa.list_(pa.uint8()))
        batch = batch.append_column('pixels', flat)
        batch = batch.append_column('decoded_width', pa.array([self.target_size[0]] * batch.num_rows, pa.int32()))
        return batch.append_column('decoded_height', pa.array([self.target_size[1]] * batch.num_rows, pa.int32()))


class ImageFeatures:
    """Decoded pixels -> small feature vector (channel means/stds + gradient energy)."""

    def __init__(self, pixels_column: str = 'pixels', width_column: str = 'decoded_width',
                 height_column: str = 'decoded_height') -> None:
        self.pixels_column = pixels_column
        self.width_column = width_column
        self.height_column = height_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths = batch.column(self.width_column).to_pylist()
        heights = batch.column(self.height_column).to_pylist()
        feats = []
        for flat, w, h in zip(batch.column(self.pixels_column).to_pylist(), widths, heights):
            img = np.asarray(flat, dtype=np.float64).reshape(h, w, -1)
            means = img.mean(axis=(0, 1))
            stds = img.std(axis=(0, 1))
            grad = np.abs(np.diff(img, axis=0)).mean() + np.abs(np.diff(img, axis=1)).mean()
            feats.append(np.concatenate([means, stds, [grad]]))
        return batch.append_column('image_features', pa.array(feats, pa.list_(pa.float64())))


class AudioFrameSample:
    """payload(binary audio) -> fixed number of sampled 'frames' (stub/fake)."""

    def __init__(self, payload_column: str = 'payload', decoder: str = 'stub',
                 num_frames: int = 8, frame_dim: int = 16) -> None:
        self.payload_column = payload_column
        self.decoder = decoder
        self.num_frames = num_frames
        self.frame_dim = frame_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == 'stub':
            raise NotImplementedError(
                'Audio codecs are not available in this environment; install soundfile/librosa '
                "and register a real decoder, or use decoder='fake' for plumbing tests.")
        frames = []
        for payload in batch.column(self.payload_column).to_pylist():
            fake = _fake_pixels(payload, self.frame_dim, self.num_frames, 1).astype(np.float64) / 255.0
            frames.append(fake.reshape(-1))
        return batch.append_column('audio_frames', pa.array(frames, pa.list_(pa.float64())))


def decode_pipeline(ds, *, decoder: str = 'fake', concurrency: int = 4, batch_size: int = 64):
    """Reference wiring: decode -> feature-extract as two actor-pool stages."""
    ds = ds.map_batches(ImageDecode, fn_constructor_kwargs={'decoder': decoder},
                        batch_format='pyarrow', batch_size=batch_size,
                        concurrency=concurrency, num_cpus=1)
    return ds.map_batches(ImageFeatures, batch_format='pyarrow', batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)
