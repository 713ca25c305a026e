"""Multimodal (image/audio/video) stages — Ray-side plumbing, stubbed codecs.

Binary payloads are opaque ``binary`` columns with typed metadata, processed
by actor-pool ``map_batches`` stages with SMALL batch sizes (a batch ×
concurrency of multi-MB payloads must fit the worker heap — the engine's
memory note for wide rows). The actual media decode requires image/audio
libraries that are not in this container, so the decode step is STUBBED:

- ``decode="strict"`` raises ``NotImplementedError`` (the honest default),
- ``decode="fake"`` produces a deterministic pseudo-decode (blake2b-seeded
  feature vector + byte-length metadata) so the full Ray plumbing — schema,
  batch sizing, actor signature, output layout — is real and tested,
- ``decode="auto"`` probes for a real decoder (PIL) once per actor at
  construction and uses it when present; payloads PIL cannot open (or a
  container without PIL at all) fall back to the deterministic fake, so the
  same pipeline runs everywhere and upgrades itself where codecs exist.

Swap ``_fake_features`` for a heavier decoder (librosa/torchvision) by
subclassing and overriding ``decode_one``; the pipeline shape is unchanged.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa


def _try_pil():
    """Probe for PIL once (per actor, from ``__init__``) — the engine runs
    in containers with and without media libraries; ``auto`` stages adapt
    instead of failing."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None

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
        assert decode in ("strict", "fake", "auto")
        self.decode = decode
        self.feature_dim = feature_dim
        self._pil = _try_pil() if decode == "auto" else None

    def _pil_features(self, payload: bytes) -> np.ndarray | None:
        """Real decode: grayscale + resize to ``feature_dim`` pixels, unit
        norm — None when the payload isn't a decodable image."""
        try:
            img = self._pil.open(io.BytesIO(payload))
            px = np.asarray(
                img.convert("L").resize((self.feature_dim, 1)), dtype=np.float32
            ).ravel()
        except Exception:
            return None
        n = float(np.linalg.norm(px))
        return (px / n) if n else px

    def decode_one(self, payload: bytes) -> np.ndarray:
        if self.decode == "strict":
            raise NotImplementedError(
                "media decode requires image/audio libraries not present in "
                "this environment; construct with decode='fake' for the "
                "deterministic stub, decode='auto' to use PIL when present, "
                "or override decode_one()"
            )
        if self.decode == "auto" and self._pil is not None:
            f = self._pil_features(payload)
            if f is not None:
                return f
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


class MediaResizeStage:
    """Actor-pool stage: payload -> resized payload (1:1, binary in/out).

    The real resampler (PIL/ffmpeg) is absent from this container, so the
    transform is stubbed behind the same strict/fake switch as
    :class:`MediaFeatureStage`; the Ray plumbing — binary Arrow columns in
    and out, per-row target dims from ``meta``, small-batch actor pool —
    is real. Fake mode emits a deterministic byte stream of size
    proportional to ``target_w*target_h`` (seeded by the input payload),
    so size accounting and downstream schema are exercised end-to-end.
    """

    def __init__(self, decode: str = "strict", target_w: int = 64, target_h: int = 64):
        assert decode in ("strict", "fake", "auto")
        self.decode = decode
        self.target_w, self.target_h = target_w, target_h
        self._pil = _try_pil() if decode == "auto" else None

    def resize_one(self, payload: bytes) -> bytes:
        if self.decode == "strict":
            raise NotImplementedError(
                "image resize requires codec libraries not present here; "
                "construct with decode='fake', decode='auto' to use PIL "
                "when present, or override resize_one()"
            )
        if self.decode == "auto" and self._pil is not None:
            try:
                img = self._pil.open(io.BytesIO(payload))
                out = io.BytesIO()
                img.resize((self.target_w, self.target_h)).save(out, format="PNG")
                return out.getvalue()
            except Exception:
                pass  # undecodable payload: deterministic fake below
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=self.target_w * self.target_h,
                            dtype=np.uint8).tobytes()

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        out = [self.resize_one(p or b"") for p in payloads]
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "payload": pa.array(out, pa.binary()),
                "meta": pa.array(
                    [f'{{"w": {self.target_w}, "h": {self.target_h}}}'] * t.num_rows,
                    pa.string(),
                ),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: one video row -> MANY frame rows (flat-map shape).

    Demonstrates the 1→N multimodal explosion with real Arrow plumbing:
    output rows are (media_id, frame_idx, payload). Strict mode raises
    (no video codec here); fake mode treats the payload as a concatenation
    of fixed-size pseudo-frames and emits every ``every``-th slice via
    :func:`frame_sample_plan` — deterministic, so row counts and indices
    are testable. Batch sizes must stay SMALL: each input row multiplies.
    """

    def __init__(self, decode: str = "strict", frame_bytes: int = 256, every: int = 4):
        # "auto" degrades to the fake splitter: no video codec is probed
        # for yet (PIL has no video support; ffmpeg bindings are heavier)
        assert decode in ("strict", "fake", "auto")
        self.decode = decode
        self.frame_bytes = frame_bytes
        self.every = every

    def frames_one(self, payload: bytes) -> list[tuple[int, bytes]]:
        if self.decode == "strict":
            raise NotImplementedError(
                "video frame extraction requires codecs not present here; "
                "construct with decode='fake' or override frames_one()"
            )
        n_frames = max(1, len(payload) // self.frame_bytes)
        return [
            (i, payload[i * self.frame_bytes : (i + 1) * self.frame_bytes])
            for i in frame_sample_plan(n_frames, self.every)
        ]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            for fi, fb in self.frames_one(payload or b""):
                ids.append(mid)
                idxs.append(fi)
                frames.append(fb)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "payload": pa.array(frames, pa.binary()),
            }
        )
