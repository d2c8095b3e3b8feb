"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode libraries (Pillow, torchaudio, pyav...) are NOT in this
container, so the decode kernels are stubbed behind a deterministic fake
(or NotImplementedError when strict), while the Ray-side plumbing — schema,
actor-pool signature, batch sizing, output layout — is real and tested.

Scale notes: binary payloads are MBs/row, so these stages use SMALL
batch_size and pyarrow batches (binary columns round-trip zero-copy through
Arrow, not through pandas object dtype).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


class ImageDecodeKernel:
    """Actor-pool stage: decode image bytes -> (width, height, feature vector).

    Real deployments plug Pillow/turbojpeg into ``_decode``; this container
    uses a deterministic fake (strict=False) so the pipeline shape is
    testable end-to-end."""

    def __init__(self, binary_col: str = 'image', feature_dim: int = 8, strict: bool = False):
        self.binary_col = binary_col
        self.feature_dim = feature_dim
        self.strict = strict
        # a real kernel would load the codec / model ONCE here (per actor)

    def _decode(self, blob: bytes):
        if self.strict:
            raise NotImplementedError('image decoding requires Pillow; not in this container')
        # deterministic fake: dimensions and features derived from a hash
        # (sha256 so the fake is reproducible in SQL for the oracle check)
        h = hashlib.sha256(blob).digest()
        width = 64 + h[0]
        height = 64 + h[1]
        feats = (np.frombuffer(h, dtype=np.uint8)[:self.feature_dim].astype(np.float32) / 255.0)
        return width, height, feats

    def __call__(self, t: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for blob in t[self.binary_col].to_pylist():
            w, h, f = self._decode(blob or b'')
            widths.append(w)
            heights.append(h)
            feats.append(f)
        t = t.append_column('width', pa.array(widths, pa.int32()))
        t = t.append_column('height', pa.array(heights, pa.int32()))
        return t.append_column('features', pa.array([f.tolist() for f in feats],
                                                    pa.list_(pa.float32())))


def decode_images(ds: ray.data.Dataset, binary_col: str = 'image', concurrency: int = 4,
                  batch_size: int = 64) -> ray.data.Dataset:
    """Small batches: batch_size * payload must fit the worker heap."""
    return ds.map_batches(ImageDecodeKernel, fn_constructor_kwargs={'binary_col': binary_col},
                          batch_format='pyarrow',
                          concurrency=(1, concurrency), batch_size=batch_size)


class FrameSampleKernel:
    """Video frame sampling stub: emits (doc_id, frame_index, frame_bytes)
    rows — one input row explodes to n_frames output rows (flat-map shape)."""

    def __init__(self, binary_col: str = 'video', n_frames: int = 4, strict: bool = False):
        self.binary_col = binary_col
        self.n_frames = n_frames
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError('video decoding requires pyav; not in this container')
        ids, frames, blobs = [], [], []
        id_col = t.column_names[0]
        for rid, blob in zip(t[id_col].to_pylist(), t[self.binary_col].to_pylist()):
            blob = blob or b''
            step = max(1, len(blob) // self.n_frames)
            for i in range(self.n_frames):
                ids.append(rid)
                frames.append(i)
                blobs.append(blob[i * step:(i + 1) * step])
        return pa.table({id_col: pa.array(ids), 'frame_index': pa.array(frames, pa.int32()),
                         'frame_bytes': pa.array(blobs, pa.large_binary())})


def sample_frames(ds: ray.data.Dataset, binary_col: str = 'video', n_frames: int = 4,
                  concurrency: int = 2, batch_size: int = 16) -> ray.data.Dataset:
    return ds.map_batches(FrameSampleKernel,
                          fn_constructor_kwargs={'binary_col': binary_col,
                                                 'n_frames': n_frames},
                          batch_format='pyarrow',
                          concurrency=(1, concurrency), batch_size=batch_size)
