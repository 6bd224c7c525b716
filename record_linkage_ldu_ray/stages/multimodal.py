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


class ImageFeatureExtractor:
    """Actor-pool decode + featurize stage for image payloads.

    Real deployments load a vision model in ``__init__`` (once per actor)
    and decode with PIL/opencv in ``__call__``.  Neither library exists in
    this container, so:

    - ``mode='strict'`` raises ``NotImplementedError`` at decode time (the
      honest stub), and
    - ``mode='fake'`` emits a deterministic pseudo-feature vector seeded by
      the payload's SHA-256 — preserving the exact schema, batch sizing and
      actor lifecycle a real extractor would have, so the pipeline around it
      is fully testable.
    """

    OUTPUT_DIM = 16

    def __init__(self, mode: str = "strict", feature_dim: int = OUTPUT_DIM):
        assert mode in ("strict", "fake")
        self.mode = mode
        self.dim = feature_dim
        # heavy model load would happen HERE, once per actor

    def _fake_features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.dim).astype(np.float32)

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "strict":
            raise NotImplementedError(
                "image decode requires PIL/opencv (not in this container); "
                "run with mode='fake' for the deterministic test path"
            )
        col = t["payload"].combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            col = col.cast(pa.large_binary())
        feats = np.stack(
            [
                self._fake_features(v) if v is not None else np.zeros(self.dim, np.float32)
                for v in col.to_pylist()
            ]
        )
        return pa.table(
            {
                "id": t["id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), self.dim
                ),
            }
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

    def _rename(t: pa.Table) -> pa.Table:
        return pa.table({"id": t[id_col], "payload": t[binary_col]})

    return (
        ds.select_columns([id_col, binary_col])
        .map_batches(_rename, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            ImageFeatureExtractor,
            fn_constructor_kwargs={"mode": mode},
            batch_format="pyarrow",
            concurrency=concurrency,
            batch_size=batch_size,
            num_cpus=1,
        )
    )
