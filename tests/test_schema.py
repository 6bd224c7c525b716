"""Scale-safety schema invariants (VERDICT r1 #5): list columns that grow
with partition size must carry int64 (Large*) offsets — a feature partition
holding > 2^31 total token hashes (plausible at 10^12-turn scale with 64
partitions) must not hit 32-bit list-offset overflow."""

import pyarrow as pa
import pytest

import ray.data

from record_linkage_ldu_ray.config import PipelineConfig
from record_linkage_ldu_ray.fixtures import FixtureSpec, cached_fixture
from record_linkage_ldu_ray.stages.features import extract_features
from record_linkage_ldu_ray.stages.normalize import normalize_transcripts


class TestLargeOffsets:
    def test_tok_hashes_offsets_are_int64(self, ray_session):
        d = cached_fixture(FixtureSpec(n_families=60))
        cfg = PipelineConfig()
        ds = ray.data.read_parquet(f"{d}/transcripts.parquet")
        feats = extract_features(normalize_transcripts(ds, cfg), cfg)
        tbl = feats.limit(50).to_arrow_refs()
        import ray as _r

        t = pa.concat_tables([x for r in tbl if len(x := _r.get(r))])
        typ = t.schema.field("tok_hashes").type
        # LargeList ⇒ 64-bit offsets: the per-partition flat token buffer
        # can exceed 2^31 entries without overflow
        assert pa.types.is_large_list(typ), typ
        assert typ.value_type == pa.uint64()
