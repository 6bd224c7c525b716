"""Multimodal (binary payload) column plumbing.

Images/audio/video travel as opaque ``binary`` columns with typed metadata;
decode / feature-extraction runs as an actor-pool ``map_batches`` stage with
small batches (payloads are large).  The decode kernels themselves are
STUBBED — the container ships no image/audio libraries — behind either a
clearly-marked ``NotImplementedError`` or a deterministic fake, but the Ray
plumbing (schema, batch sizing, actor signature, output layout) is real and
tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

# magic-byte sniffing table (public file signatures)
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),  # RIFF container (refined by bytes 8-12 in a real impl)
    (b"ID3", "audio/mp3"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
]


def sniff_kind(payload: bytes | None) -> str:
    if payload is None:
        return "null"
    for magic, kind in _MAGIC:
        if payload[: len(magic)] == magic:
            return kind
    return "unknown"


def payload_metadata(
    ds: "ray.data.Dataset", id_col: str, binary_col: str
) -> "ray.data.Dataset":
    """Typed metadata for an opaque binary column: byte length, SHA-256 hex,
    sniffed media kind.  Stateless vectorized map — the cheap pass that runs
    BEFORE any expensive decode so downstream stages can filter/route.

    Output: (id, n_bytes:int64, sha256:string, kind:string).
    """

    def _meta(t: pa.Table) -> pa.Table:
        col = t[binary_col].combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            col = col.cast(pa.large_binary())
        vals = col.to_pylist()
        n_bytes = [len(v) if v is not None else None for v in vals]
        sha = [hashlib.sha256(v).hexdigest() if v is not None else None for v in vals]
        kind = [sniff_kind(v) for v in vals]
        return pa.table(
            {
                id_col: t[id_col],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "sha256": pa.array(sha, pa.string()),
                "kind": pa.array(kind, pa.string()),
            }
        )

    return ds.select_columns([id_col, binary_col]).map_batches(
        _meta, batch_format="pyarrow", zero_copy_batch=True
    )


class _PayloadActorStage:
    """Shared lifecycle for stubbed binary-payload actor stages.

    Real deployments load the heavy decoder/model in ``__init__`` (once per
    actor) and decode in ``__call__``.  The decode libraries don't exist in
    this container, so every subclass supports:

    - ``mode='strict'`` — raises ``NotImplementedError`` at decode time
      (the honest stub), and
    - ``mode='fake'`` — a deterministic output seeded by the payload's
      SHA-256, preserving the exact schema, batch sizing and actor
      lifecycle a real kernel would have, so the pipeline around it is
      fully testable.
    """

    MODALITY = "payload"
    REQUIRES = "a decode library"

    def __init__(self, mode: str = "strict"):
        assert mode in ("strict", "fake")
        self.mode = mode
        # heavy model / decoder load would happen HERE, once per actor

    def _strict_raise(self):
        raise NotImplementedError(
            f"{self.MODALITY} decode requires {self.REQUIRES} (not in this "
            "container); run with mode='fake' for the deterministic test path"
        )

    @staticmethod
    def _payload_col(t: pa.Table) -> pa.Array:
        col = t["payload"].combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            col = col.cast(pa.large_binary())
        return col

    @staticmethod
    def _rng_for(payload: bytes) -> np.random.Generator:
        digest = hashlib.sha256(payload).digest()
        return np.random.default_rng(int.from_bytes(digest[:8], "little"))


class ImageFeatureExtractor(_PayloadActorStage):
    """Actor-pool decode + featurize stage for image payloads (PIL/opencv +
    vision model in a real deployment; see ``_PayloadActorStage``)."""

    MODALITY = "image"
    REQUIRES = "PIL/opencv"
    OUTPUT_DIM = 16
    _GOLDEN = np.uint64(0x9E3779B97F4A7C15)

    def __init__(self, mode: str = "strict", feature_dim: int = OUTPUT_DIM):
        super().__init__(mode)
        self.dim = feature_dim

    def _fake_feature_matrix(self, col: pa.Array) -> np.ndarray:
        """Deterministic fake features from the engine's SQL-replayable
        hash family (NOT a PCG64 stream): lane d of payload p is

            u = splitmix64((fnv1a(p) + (d+1) * golden) mod 2^64)
            f = float32((u >> 11) / 2^52 - 1)        # exact in double

        — FNV-1a over the payload bytes and the splitmix64 finalizer are
        the same kernels every oracle path replays in DuckDB
        (functions/hashing.py), so this stub has an EXACT SQL oracle
        (oracle_sql()['image_features_stub']).  Vectorized: one hash pass
        over the batch + one splitmix over an (n, dim) lane matrix.
        Null payloads keep the zero-vector contract."""
        from record_linkage_ldu_ray.functions.hashing import (
            fnv1a_hash_strings,
            splitmix64,
        )

        h0 = fnv1a_hash_strings(col)
        lanes = (np.arange(self.dim, dtype=np.uint64) + np.uint64(1)) * self._GOLDEN
        with np.errstate(over="ignore"):
            mixed = splitmix64(h0[:, None] + lanes[None, :])
        feats = (
            (mixed >> np.uint64(11)).astype(np.float64) / float(1 << 52) - 1.0
        ).astype(np.float32)
        nulls = np.asarray(col.is_null())
        if nulls.any():
            feats[nulls] = 0.0
        return feats

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "strict":
            self._strict_raise()
        col = self._payload_col(t)
        feats = self._fake_feature_matrix(col)
        return pa.table(
            {
                "id": t["id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), self.dim
                ),
            }
        )


class ImageResizer(_PayloadActorStage):
    """Actor-pool image resize stage (decode → scale → re-encode in a real
    deployment).  Fake mode emits a deterministic pseudo-thumbnail whose
    bytes are seeded by the input payload's SHA-256, sized proportionally to
    ``width × height`` — preserving the invariant a real resizer has
    (output size is a function of target dims, not input size), so
    batch-size math downstream is testable.

    Output: (id, payload:large_binary, width:int32, height:int32).
    """

    MODALITY = "image"
    REQUIRES = "PIL/opencv"

    def __init__(self, mode: str = "strict", width: int = 64, height: int = 64):
        super().__init__(mode)
        self.width = int(width)
        self.height = int(height)

    def _fake_resize(self, payload: bytes) -> bytes:
        # ~1 byte/px stand-in for the re-encoded thumbnail
        n = max(8, (self.width * self.height) // 8)
        return self._rng_for(payload).bytes(n)

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "strict":
            self._strict_raise()
        col = self._payload_col(t)
        out = [
            self._fake_resize(v) if v is not None else None for v in col.to_pylist()
        ]
        n = len(t)
        return pa.table(
            {
                "id": t["id"],
                "payload": pa.array(out, pa.large_binary()),
                "width": pa.array([self.width] * n, pa.int32()),
                "height": pa.array([self.height] * n, pa.int32()),
            }
        )


class AudioFeatureExtractor(_PayloadActorStage):
    """Actor-pool audio featurize stage (soundfile/librosa + an embedding
    model in a real deployment).  Fake mode emits a deterministic
    fixed-dimension float vector per payload (schema identical to a real
    log-mel / embedding head).

    Output: (id, features:fixed_size_list<float32>[dim], duration_s:float32).
    """

    MODALITY = "audio"
    REQUIRES = "soundfile/librosa"
    OUTPUT_DIM = 16

    def __init__(self, mode: str = "strict", feature_dim: int = OUTPUT_DIM):
        super().__init__(mode)
        self.dim = feature_dim

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "strict":
            self._strict_raise()
        col = self._payload_col(t)
        vals = col.to_pylist()
        feats = np.stack(
            [
                self._rng_for(v).standard_normal(self.dim).astype(np.float32)
                if v is not None
                else np.zeros(self.dim, np.float32)
                for v in vals
            ]
        )
        # fake duration: proportional to payload bytes (real: frames / rate)
        dur = np.array(
            [len(v) / 16000.0 if v is not None else 0.0 for v in vals], np.float32
        )
        return pa.table(
            {
                "id": t["id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), self.dim
                ),
                "duration_s": pa.array(dur),
            }
        )


class VideoFrameSampler(_PayloadActorStage):
    """Actor-pool frame-sampling stage: one video payload row → up to
    ``frames_per_video`` frame rows (a 1→k fan-out inside ``map_batches``;
    Ray Data splits oversized output blocks, so k × frame bytes per input
    row — not the video size — bounds the output block).  Fake mode emits
    deterministic pseudo-frames seeded by (payload SHA-256, frame index).

    Output: (id, frame_idx:int32, frame:large_binary) — nulls drop (no
    frames to sample).
    """

    MODALITY = "video"
    REQUIRES = "ffmpeg/pyav"

    def __init__(
        self, mode: str = "strict", frames_per_video: int = 4, frame_bytes: int = 256
    ):
        super().__init__(mode)
        self.k = int(frames_per_video)
        self.frame_bytes = int(frame_bytes)

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "strict":
            self._strict_raise()
        col = self._payload_col(t)
        ids, idxs, frames = [], [], []
        for rid, v in zip(t["id"].to_pylist(), col.to_pylist()):
            if v is None:
                continue
            rng = self._rng_for(v)
            for j in range(self.k):
                ids.append(rid)
                idxs.append(j)
                frames.append(rng.bytes(self.frame_bytes))
        return pa.table(
            {
                "id": pa.array(ids, t["id"].type),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.large_binary()),
            }
        )


def _payload_stage(
    ds: "ray.data.Dataset",
    id_col: str,
    binary_col: str,
    stage_cls,
    stage_kwargs: dict,
    concurrency: tuple[int, int],
    batch_size: int,
) -> "ray.data.Dataset":
    """Common plumbing: project to (id, payload), run the actor-pool stage
    with SMALL batches (payloads are large binaries — batch × concurrency
    must fit the worker heap)."""

    def _rename(t: pa.Table) -> pa.Table:
        return pa.table({"id": t[id_col], "payload": t[binary_col]})

    return (
        ds.select_columns([id_col, binary_col])
        .map_batches(_rename, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            stage_cls,
            fn_constructor_kwargs=stage_kwargs,
            batch_format="pyarrow",
            concurrency=concurrency,
            batch_size=batch_size,
            num_cpus=1,
        )
    )


def extract_image_features(
    ds: "ray.data.Dataset",
    id_col: str,
    binary_col: str,
    mode: str = "strict",
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int = 64,  # small: payloads are large binaries
) -> "ray.data.Dataset":
    """Actor-pool featurize stage over a binary column (schema/plumbing is
    real; the decode kernel is stubbed, see ``ImageFeatureExtractor``)."""
    return _payload_stage(
        ds, id_col, binary_col, ImageFeatureExtractor, {"mode": mode},
        concurrency, batch_size,
    )


def resize_images(
    ds: "ray.data.Dataset",
    id_col: str,
    binary_col: str,
    mode: str = "strict",
    width: int = 64,
    height: int = 64,
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Actor-pool image-resize stage (stubbed kernel, real plumbing)."""
    return _payload_stage(
        ds, id_col, binary_col, ImageResizer,
        {"mode": mode, "width": width, "height": height},
        concurrency, batch_size,
    )


def extract_audio_features(
    ds: "ray.data.Dataset",
    id_col: str,
    binary_col: str,
    mode: str = "strict",
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Actor-pool audio featurize stage (stubbed kernel, real plumbing)."""
    return _payload_stage(
        ds, id_col, binary_col, AudioFeatureExtractor, {"mode": mode},
        concurrency, batch_size,
    )


def sample_video_frames(
    ds: "ray.data.Dataset",
    id_col: str,
    binary_col: str,
    mode: str = "strict",
    frames_per_video: int = 4,
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int = 16,  # videos are the largest payloads; smallest batches
) -> "ray.data.Dataset":
    """Actor-pool video frame-sampling stage: 1 video row → k frame rows
    (stubbed decode, real fan-out plumbing)."""
    return _payload_stage(
        ds, id_col, binary_col, VideoFrameSampler,
        {"mode": mode, "frames_per_video": frames_per_video},
        concurrency, batch_size,
    )
