"""Multimodal binary-payload plumbing: metadata sniffing, stubbed
decode/featurize/resize/frame-sample actor stages (schema, determinism,
null handling, strict-mode honesty)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from record_linkage_ldu_ray.stages.multimodal import (
    AudioFeatureExtractor,
    ImageFeatureExtractor,
    ImageResizer,
    VideoFrameSampler,
    extract_audio_features,
    extract_image_features,
    payload_metadata,
    resize_images,
    sample_video_frames,
    sniff_kind,
)


def _payload_ds():
    png = b"\x89PNG\r\n\x1a\n" + b"fakepng"
    jpg = b"\xff\xd8\xff" + b"fakejpg"
    webm = b"\x1a\x45\xdf\xa3" + b"fakewebm"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "blob": pa.array([png, jpg, webm, None], pa.large_binary()),
        }
    )
    return ray.data.from_arrow(t), {1: png, 2: jpg, 3: webm}


class TestPayloadMetadata:
    def test_sniff_kinds(self):
        assert sniff_kind(b"\x89PNG\r\n\x1a\nxx") == "image/png"
        assert sniff_kind(b"\xff\xd8\xffxx") == "image/jpeg"
        assert sniff_kind(b"\x1a\x45\xdf\xa3xx") == "video/webm"
        assert sniff_kind(b"??") == "unknown"
        assert sniff_kind(None) == "null"

    def test_metadata_table(self, ray_session):
        ds, payloads = _payload_ds()
        out = payload_metadata(ds, "doc_id", "blob").to_pandas().set_index("doc_id")
        assert out.loc[1, "kind"] == "image/png"
        assert out.loc[3, "kind"] == "video/webm"
        assert out.loc[1, "sha256"] == hashlib.sha256(payloads[1]).hexdigest()
        assert out.loc[2, "n_bytes"] == len(payloads[2])
        assert out.loc[4, "sha256"] is None or np.isnan(
            out.loc[4, "n_bytes"]
        ) or out.loc[4, "n_bytes"] is None


class TestStrictStubs:
    @pytest.mark.parametrize(
        "cls", [ImageFeatureExtractor, ImageResizer, AudioFeatureExtractor, VideoFrameSampler]
    )
    def test_strict_mode_raises(self, cls):
        stage = cls(mode="strict")
        t = pa.table(
            {"id": pa.array([1], pa.int64()), "payload": pa.array([b"x"], pa.large_binary())}
        )
        with pytest.raises(NotImplementedError):
            stage(t)


class TestFakeKernels:
    def test_image_features_deterministic(self, ray_session):
        ds, _ = _payload_ds()
        a = extract_image_features(ds, "doc_id", "blob", mode="fake").to_pandas()
        b = extract_image_features(ds, "doc_id", "blob", mode="fake").to_pandas()
        assert len(a) == 4
        assert all(len(v) == ImageFeatureExtractor.OUTPUT_DIM for v in a["features"])
        for x, y in zip(a.sort_values("id")["features"], b.sort_values("id")["features"]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_resize_schema_and_size(self, ray_session):
        ds, _ = _payload_ds()
        out = resize_images(ds, "doc_id", "blob", mode="fake", width=32, height=32).to_pandas()
        assert list(out.columns) == ["id", "payload", "width", "height"]
        assert (out["width"] == 32).all() and (out["height"] == 32).all()
        got = out.set_index("id")["payload"]
        # output thumbnail size depends only on target dims, not input size
        sizes = {len(got[i]) for i in (1, 2, 3)}
        assert sizes == {max(8, 32 * 32 // 8)}
        assert got[4] is None
        # deterministic: same payload → same thumbnail
        out2 = resize_images(ds, "doc_id", "blob", mode="fake", width=32, height=32).to_pandas()
        assert out2.set_index("id")["payload"][1] == got[1]

    def test_audio_features_schema(self, ray_session):
        ds, payloads = _payload_ds()
        out = extract_audio_features(ds, "doc_id", "blob", mode="fake").to_pandas()
        assert list(out.columns) == ["id", "features", "duration_s"]
        row = out.set_index("id").loc[2]
        assert len(row["features"]) == AudioFeatureExtractor.OUTPUT_DIM
        assert row["duration_s"] == pytest.approx(len(payloads[2]) / 16000.0)

    def test_video_frame_fanout(self, ray_session):
        ds, _ = _payload_ds()
        out = sample_video_frames(
            ds, "doc_id", "blob", mode="fake", frames_per_video=3
        ).to_pandas()
        # 3 non-null videos × 3 frames; the null row drops
        assert len(out) == 9
        assert sorted(out["id"].unique()) == [1, 2, 3]
        per = out.groupby("id")["frame_idx"].apply(lambda s: sorted(s))
        assert all(list(v) == [0, 1, 2] for v in per)
        assert all(len(f) == 256 for f in out["frame"])


class TestImageFakeKernelOracleParity:
    """The fake image decode is splitmix64(fnv1a(payload) + (d+1)*golden)
    mapped to [-1, 1) — pinned here against a scalar pure-Python replay so
    the SQL oracle (oracle_sql()['image_features_stub']) and the kernel
    can't drift apart silently."""

    @staticmethod
    def _scalar_lane(payload: bytes, d: int) -> np.float32:
        M = (1 << 64) - 1

        def sm(z):
            z = (z + 0x9E3779B97F4A7C15) & M
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
            return z ^ (z >> 31)

        h = 0xCBF29CE484222325
        for b in payload:
            h = ((h ^ b) * 0x100000001B3) & M
        h0 = sm(h)
        u = sm((h0 + (d + 1) * 0x9E3779B97F4A7C15) & M)
        return np.float32((u >> 11) / float(1 << 52) - 1.0)

    def test_matches_scalar_replay(self):
        payloads = [b"", b"a", "café au lait".encode(), b"\x00\xff" * 40]
        col = pa.array(payloads, pa.large_binary())
        stage = ImageFeatureExtractor(mode="fake")
        feats = stage._fake_feature_matrix(col)
        assert feats.dtype == np.float32 and feats.shape == (4, 16)
        for i, p in enumerate(payloads):
            for d in range(16):
                assert feats[i, d] == self._scalar_lane(p, d)
        assert (np.abs(feats) <= 1.0).all()

    def test_null_payload_zero_vector(self):
        col = pa.array([None, b"x"], pa.large_binary())
        feats = ImageFeatureExtractor(mode="fake")._fake_feature_matrix(col)
        assert (feats[0] == 0).all() and not (feats[1] == 0).all()
