"""Pair-enumeration unit tests: lowest-colliding-band ownership must skip
DROPPED band blocks (a dropped block emits no rows, so a pair whose lowest
colliding band was dropped would otherwise be lost from every surviving
block — ADVICE r1, high)."""

import numpy as np
import pyarrow as pa
import pytest

from record_linkage_ldu_ray.config import (
    BlockingConfig,
    MinHashConfig,
    PipelineConfig,
)
from record_linkage_ldu_ray.functions.minhash import lsh_band_hashes
from record_linkage_ldu_ray.stages.pairs import _enumerate_part


CFG = PipelineConfig(
    minhash=MinHashConfig(num_perm=4),
    blocking=BlockingConfig(bands=2, rows_per_band=2),
)


def _block_table(sigs: np.ndarray, block_key: int, key_src: int) -> pa.Table:
    """Two-record block-rows table with the given MinHash signatures,
    enumerated as one block (block_key, key_src)."""
    n = sigs.shape[0]
    ids = [f"c{i:03d}" for i in range(n)]
    return pa.table(
        {
            "conv_id": pa.array(ids),
            "n_turns": pa.array([3] * n, pa.int32()),
            "ts_min": pa.array([1_000_000] * n, pa.timestamp("us")),
            "text_prefix": pa.array(["alpha beta"] * n),
            "role_seq": pa.array(["uau"] * n),
            "tool_seq": pa.array(["t1"] * n),
            "tok_hashes": pa.array([[1, 2, 3]] * n, pa.list_(pa.uint64())),
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1), pa.uint64()), sigs.shape[1]
            ),
            "block_key": pa.array([block_key] * n, pa.int64()),
            "key_src": pa.array([key_src] * n, pa.int8()),
            "salt_bucket": pa.array([-1] * n, pa.int8()),
            "salt_diag": pa.array([False] * n, pa.bool_()),
        }
    )


def _pair_ids(tbl: pa.Table) -> set:
    return set(
        zip(tbl["conv_id_a"].to_pylist(), tbl["conv_id_b"].to_pylist())
    )


class TestDroppedBandOwnership:
    def test_band_block_inherits_ownership_when_lower_band_dropped(self):
        # both records share ALL minhash rows → collide in band 0 AND band 1
        sigs = np.tile(np.array([11, 22, 33, 44], dtype=np.uint64), (2, 1))
        keys = lsh_band_hashes(sigs, CFG.blocking)  # (2, 2), rows identical
        k0 = int(keys[0, 0].view(np.int64))
        k1 = int(keys[0, 1].view(np.int64))

        tbl = _block_table(sigs, block_key=k1, key_src=1)
        # without the dropped set: band 0 owns the pair → band-1 block drops it
        assert len(_enumerate_part(tbl, CFG)) == 0
        # band 0's block was dropped → ownership falls to band 1
        out = _enumerate_part(tbl, CFG, dropped_keys=np.array([k0], np.int64))
        assert _pair_ids(out) == {("c000", "c001")}

    def test_prefix_block_owns_pair_when_all_bands_dropped(self):
        sigs = np.tile(np.array([11, 22, 33, 44], dtype=np.uint64), (2, 1))
        keys = lsh_band_hashes(sigs, CFG.blocking)
        dropped = keys[0].view(np.int64).copy()  # both band blocks dropped

        prefix_key = 12345
        tbl = _block_table(sigs, block_key=prefix_key, key_src=CFG.blocking.bands)
        # prefix block normally only emits pairs colliding in NO band
        assert len(_enumerate_part(tbl, CFG)) == 0
        out = _enumerate_part(tbl, CFG, dropped_keys=dropped)
        assert _pair_ids(out) == {("c000", "c001")}

    def test_undropped_lowest_band_still_owns(self):
        sigs = np.tile(np.array([11, 22, 33, 44], dtype=np.uint64), (2, 1))
        keys = lsh_band_hashes(sigs, CFG.blocking)
        k0 = int(keys[0, 0].view(np.int64))
        tbl = _block_table(sigs, block_key=k0, key_src=0)
        # band 0 not dropped → it owns the pair, with or without a dropped set
        out = _enumerate_part(
            tbl, CFG, dropped_keys=np.array([999999], np.int64)
        )
        assert _pair_ids(out) == {("c000", "c001")}
        # and the band-1 copy of the block still rejects it
        k1 = int(keys[0, 1].view(np.int64))
        tbl1 = _block_table(sigs, block_key=k1, key_src=1)
        assert len(
            _enumerate_part(tbl1, CFG, dropped_keys=np.array([999999], np.int64))
        ) == 0
