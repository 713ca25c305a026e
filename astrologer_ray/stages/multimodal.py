"""Multimodal (image/audio/video) stages — Ray-side plumbing, stubbed codecs.

Binary payloads are opaque ``binary`` columns with typed metadata, processed
by actor-pool ``map_batches`` stages with SMALL batch sizes (a batch ×
concurrency of multi-MB payloads must fit the worker heap — the engine's
memory note for wide rows). The actual media decode requires image/audio
libraries that are not in this container, so the decode step is STUBBED:

- ``decode="strict"`` raises ``NotImplementedError`` (the honest default),
- ``decode="fake"`` produces a deterministic pseudo-decode (blake2b-seeded
  feature vector + byte-length metadata) so the full Ray plumbing — schema,
  batch sizing, actor signature, output layout — is real and tested.

Swap ``_fake_features`` for a real decoder (PIL/librosa/torchvision) by
subclassing and overriding ``decode_one``; the pipeline shape is unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),     # opaque encoded bytes
        ("meta", pa.string()),        # free-form typed metadata (json)
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic pseudo-feature vector derived from the bytes."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


class MediaFeatureStage:
    """Actor-pool stage: (media_id, payload) -> (media_id, n_bytes, feature).

    Run with ``map_batches(MediaFeatureStage, batch_size=SMALL,
    concurrency=N, num_cpus=1, batch_format="pyarrow")`` — binary columns
    stay in Arrow (pandas would copy to object dtype).
    """

    def __init__(self, decode: str = "strict", feature_dim: int = FEATURE_DIM):
        assert decode in ("strict", "fake")
        self.decode = decode
        self.feature_dim = feature_dim

    def decode_one(self, payload: bytes) -> np.ndarray:
        if self.decode == "strict":
            raise NotImplementedError(
                "media decode requires image/audio libraries not present in "
                "this environment; construct with decode='fake' for the "
                "deterministic stub, or override decode_one()"
            )
        return _fake_features(payload, self.feature_dim)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        feats = [self.decode_one(p or b"") for p in payloads]
        return pa.table(
            {
                "media_id": t["media_id"],
                "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def frame_sample_plan(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling indices for a video payload (plumbing
    helper; the actual frame extraction is part of the stubbed decode)."""
    return list(range(0, n_frames, max(1, every)))
