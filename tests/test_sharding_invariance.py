"""Multi-shard prediction must reproduce the unsharded run read-for-read."""

import numpy as np

from seq2squiggle_tpu.io.slow5 import read_slow5


def test_two_shards_match_unsharded(tmp_path):
    from test_e2e import _run

    _run(tmp_path / "all.slow5", preserve_read_ids=True)
    _run(tmp_path / "s0.slow5", preserve_read_ids=True, num_shards=2,
         shard_index=0)
    _run(tmp_path / "s1.slow5", preserve_read_ids=True, num_shards=2,
         shard_index=1)

    def by_id(path):
        _, recs = read_slow5(path)
        return {r["read_id"]: r["signal"] for r in recs}

    full = by_id(tmp_path / "all.slow5")
    sharded = {**by_id(tmp_path / "s0.slow5"), **by_id(tmp_path / "s1.slow5")}
    assert set(full) == set(sharded)
    assert len(full) == 7
    for read_id, signal in full.items():
        np.testing.assert_array_equal(signal, sharded[read_id])


def test_device_dp_matches_single_device(tmp_path):
    """batch divisible by 8 devices -> shard_map dp path; must equal the
    single-device path bit-for-bit."""
    from test_e2e import _run

    _run(tmp_path / "dp.slow5", batch_size=64)   # 64 % 8 == 0 -> device dp
    _run(tmp_path / "sd.slow5", batch_size=63)   # 63 % 8 != 0 -> single device
    from seq2squiggle_tpu.io.slow5 import read_slow5

    _, r1 = read_slow5(tmp_path / "dp.slow5")
    _, r2 = read_slow5(tmp_path / "sd.slow5")
    assert len(r1) == len(r2) == 7
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a["signal"], b["signal"])


def test_sharded_indexed_read_ids_are_global(tmp_path):
    """Without --preserve-read-ids, indexed UUIDs must number reads by
    GLOBAL read index: shard files merged together must reproduce the
    unsharded run's (read_id -> signal) mapping with no collisions
    (round-2 regression: per-writer counters restarted at 0 per shard)."""
    from test_e2e import _run

    _run(tmp_path / "all.slow5")
    _run(tmp_path / "s0.slow5", num_shards=2, shard_index=0)
    _run(tmp_path / "s1.slow5", num_shards=2, shard_index=1)

    def by_id(path):
        _, recs = read_slow5(path)
        return {r["read_id"]: (r["signal"], r["read_number"]) for r in recs}

    full = by_id(tmp_path / "all.slow5")
    s0 = by_id(tmp_path / "s0.slow5")
    s1 = by_id(tmp_path / "s1.slow5")
    assert not (set(s0) & set(s1)), "read-id collision across shards"
    sharded = {**s0, **s1}
    assert set(full) == set(sharded)
    for read_id, (signal, read_number) in full.items():
        np.testing.assert_array_equal(signal, sharded[read_id][0])
        assert read_number == sharded[read_id][1]
