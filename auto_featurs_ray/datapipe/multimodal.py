"""Multimodal (image/audio/video) processing over binary columns.

Media ride as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches`` stages.

Decoders (``decoder=`` on each stage):

* ``'auto'`` — REAL decoding for the container-formats decodable with the
  stdlib + NumPy alone: PPM/PGM (``P6``/``P5``) and uncompressed 24-bit BMP
  images, and PCM WAV audio (stdlib ``wave``).  Compressed codecs (JPEG/PNG/
  MP3/...) raise ``NotImplementedError`` with install guidance — those
  libraries are not in this container.
* ``'fake'`` — deterministic hash-derived payload, for plumbing tests.
* ``'stub'`` — always raises; use to assert a pipeline never decodes.

Batch-size guidance: media rows are KB-MB each; size ``batch_size`` by bytes
(e.g. 32-256 rows), keep ``batch_format='pyarrow'`` so binary payloads stay
zero-copy, and give each decode actor ``num_cpus>=1``.
"""

from __future__ import annotations

import hashlib
import io
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


def _pnm_tokens(payload: bytes, count: int):
    """First ``count`` whitespace-separated header tokens after the magic,
    honoring '#' comment lines (PPM/PGM spec)."""
    tokens = []
    pos = 2
    while len(tokens) < count:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b'#':
            while pos < len(payload) and payload[pos:pos + 1] != b'\n':
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    return tokens, pos + 1  # single whitespace after maxval precedes raster


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """Decode PPM (P6), PGM (P5) or uncompressed 24-bit BMP into an
    (h, w, channels) uint8 array — stdlib + NumPy only, no codec libraries."""
    if payload[:2] in (b'P6', b'P5'):
        channels = 3 if payload[:2] == b'P6' else 1
        (width, height, maxval), start = _pnm_tokens(payload, 3)
        if maxval > 255:
            raise NotImplementedError('16-bit PNM rasters are not supported')
        raster = np.frombuffer(payload, dtype=np.uint8, count=width * height * channels,
                               offset=start)
        return raster.reshape(height, width, channels)
    if payload[:2] == b'BM':
        data_offset = int.from_bytes(payload[10:14], 'little')
        width = int.from_bytes(payload[18:22], 'little', signed=True)
        height = int.from_bytes(payload[22:26], 'little', signed=True)
        bpp = int.from_bytes(payload[28:30], 'little')
        compression = int.from_bytes(payload[30:34], 'little')
        if bpp != 24 or compression != 0:
            raise NotImplementedError('Only uncompressed 24-bit BMP is supported')
        bottom_up = height > 0
        height = abs(height)
        stride = ((width * 3 + 3) // 4) * 4
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * height,
                             offset=data_offset).reshape(height, stride)
        img = rows[:, :width * 3].reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
        return img[::-1] if bottom_up else img
    raise NotImplementedError(
        'Compressed image codecs (JPEG/PNG/...) are not available in this environment; '
        "install Pillow/opencv and register a real decoder, or feed PPM/PGM/BMP payloads.")


def decode_wav_bytes(payload: bytes) -> Tuple[np.ndarray, int]:
    """PCM WAV -> (mono float64 signal in [-1, 1], sample_rate); stdlib only."""
    import wave

    with wave.open(io.BytesIO(payload)) as wav:
        channels = wav.getnchannels()
        width = wav.getsampwidth()
        rate = wav.getframerate()
        raw = wav.readframes(wav.getnframes())
    if width == 2:
        signal = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32768.0
    elif width == 1:
        signal = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f'{8 * width}-bit PCM WAV is not supported')
    if channels > 1:
        signal = signal.reshape(-1, channels).mean(axis=1)
    return signal, rate


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather — pure NumPy."""
    src_h, src_w = img.shape[:2]
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    return img[ys][:, xs]


class ImageDecode:
    """payload(binary) -> decoded pixel tensor (list<uint8> flattened) + dims."""

    def __init__(self, payload_column: str = 'payload', decoder: str = 'auto',
                 target_size: Tuple[int, int] = (32, 32)) -> None:
        if decoder not in ('auto', 'stub', 'fake'):
            raise ValueError(f'Unknown decoder: {decoder}')
        self.payload_column = payload_column
        self.decoder = decoder
        self.target_size = target_size

    def decode_one(self, payload: bytes) -> np.ndarray:
        if self.decoder == 'stub':
            raise NotImplementedError(
                'ImageDecode was constructed with decoder="stub"; use "auto" (real '
                'PPM/PGM/BMP decoding) or "fake" (deterministic plumbing payload).')
        w, h = self.target_size
        if self.decoder == 'fake':
            return _fake_pixels(payload, w, h)
        return resize_nearest(decode_image_bytes(payload), w, h)

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
    """payload(binary audio) -> ``num_frames`` fixed-dim frames.

    ``decoder='auto'`` really decodes PCM WAV (stdlib ``wave``): the mono
    signal is split into ``num_frames`` equal segments and each segment is
    sampled at ``frame_dim`` evenly spaced points (deterministic downsample).
    MP3/FLAC/... raise ``NotImplementedError`` (codec libs not installed).
    """

    def __init__(self, payload_column: str = 'payload', decoder: str = 'auto',
                 num_frames: int = 8, frame_dim: int = 16) -> None:
        if decoder not in ('auto', 'stub', 'fake'):
            raise ValueError(f'Unknown decoder: {decoder}')
        self.payload_column = payload_column
        self.decoder = decoder
        self.num_frames = num_frames
        self.frame_dim = frame_dim

    def _frames_one(self, payload: bytes) -> np.ndarray:
        if self.decoder == 'stub':
            raise NotImplementedError(
                'AudioFrameSample was constructed with decoder="stub"; use "auto" (real '
                'PCM WAV decoding) or "fake" (deterministic plumbing payload).')
        if self.decoder == 'fake':
            fake = _fake_pixels(payload, self.frame_dim, self.num_frames, 1).astype(np.float64) / 255.0
            return fake.reshape(-1)
        if payload[:4] != b'RIFF':
            raise NotImplementedError(
                'Compressed audio codecs (MP3/FLAC/...) are not available in this '
                'environment; install soundfile/librosa or feed PCM WAV payloads.')
        signal, _rate = decode_wav_bytes(payload)
        if len(signal) == 0:
            return np.zeros(self.num_frames * self.frame_dim)
        total = self.num_frames * self.frame_dim
        idx = (np.arange(total) * len(signal)) // total
        return signal[idx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames = [self._frames_one(p) for p in batch.column(self.payload_column).to_pylist()]
        return batch.append_column('audio_frames', pa.array(frames, pa.list_(pa.float64())))


def decode_pipeline(ds, *, decoder: str = 'fake', concurrency: int = 4, batch_size: int = 64):
    """Reference wiring: decode -> feature-extract as two actor-pool stages."""
    ds = ds.map_batches(ImageDecode, fn_constructor_kwargs={'decoder': decoder},
                        batch_format='pyarrow', batch_size=batch_size,
                        concurrency=concurrency, num_cpus=1)
    return ds.map_batches(ImageFeatures, batch_format='pyarrow', batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)
