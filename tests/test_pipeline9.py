"""Round-9 split rebalance — the r8 postmortem fix: the per-bucket test
floor must never invert a bucket (more test than train rows), and the
rebalance must be leak-safe (old TRAIN rows never enter test/calib)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from pipeline9 import _rebalanced_split  # noqa: E402

from deep_query_optimization_spark.estimator import QueriesDataset


def _mk(rows, path):
    ds = QueriesDataset()
    for s, rt in rows:
        ds.add(s, rt)
    ds.save(str(path))


def test_rebalanced_split_caps_test_and_never_leaks_train(tmp_path):
    old_dir, gen_dir, out = tmp_path / "old", tmp_path / "gen", tmp_path / "out"
    old_dir.mkdir()
    gen_dir.mkdir()

    # bucket 5 (rt 30 s): the r8 inversion — 30 test rows vs 5 train
    a_train = [(f"SELECT {i} FROM a_tr", 30.0) for i in range(5)]
    a_test = [(f"SELECT {i} FROM a_te", 30.0) for i in range(30)]
    a_calib = [("SELECT 0 FROM a_ca", 30.0)]
    a_new = [(f"SELECT {i} FROM a_new", 30.0) for i in range(10)]
    # bucket 0 (rt 1 s): test under cap, new rows must top it up
    b_train = [(f"SELECT {i} FROM b_tr", 1.0) for i in range(5)]
    b_test = [(f"SELECT {i} FROM b_te", 1.0) for i in range(3)]
    b_new = [(f"SELECT {i} FROM b_new", 1.0) for i in range(40)]

    _mk(a_train + b_train, old_dir / "workload.csv")
    _mk(a_test + b_test, old_dir / "test.csv")
    _mk(a_calib, old_dir / "calib.csv")
    _mk(a_train + a_test + a_calib + a_new + b_train + b_test + b_new, gen_dir / "workload.csv")
    (gen_dir / "schema.json").write_text("{}")

    _rebalanced_split(
        gen_dir / "workload.csv", old_dir, out, test_floor=25, calib_frac_new=0.05, calib_cap=10
    )

    train = QueriesDataset.load(str(out / "workload.csv"))
    test = QueriesDataset.load(str(out / "test.csv"))
    calib = QueriesDataset.load(str(out / "calib.csv"))

    # conservation: every corpus row lands in exactly one split
    all_in = {s for s, *_ in train.rows} | {s for s, *_ in test.rows} | {s for s, *_ in calib.rows}
    assert len(train.rows) + len(test.rows) + len(calib.rows) == 94
    assert len(all_in) == 94

    # leak safety: no old TRAIN row may ever reach test or calib
    old_train_sqls = {s for s, _ in a_train + b_train}
    assert not (old_train_sqls & {s for s, *_ in test.rows})
    assert not (old_train_sqls & {s for s, *_ in calib.rows})

    def bucket_count(ds, frag):
        return sum(1 for s, *_ in ds.rows if frag in s)

    # bucket 5: total 46 -> cap min(25, 18) = 18; 12 excess test rows
    # moved to TRAIN (the inversion undone), none discarded
    assert bucket_count(test, "a_") == 18
    assert bucket_count(train, "a_te") == 12
    assert bucket_count(train, "a_") > bucket_count(test, "a_")

    # bucket 0: total 48 -> cap min(25, 19) = 19; topped up from NEW
    # rows only, remainder (minus a small calib carve) to train
    assert bucket_count(test, "b_") == 19
    assert bucket_count(test, "b_te") == 3
    assert bucket_count(test, "b_new") == 16
    assert bucket_count(calib, "b_new") == 1
    assert bucket_count(train, "b_new") == 23


def test_balanced_gen_full_reference_span():
    """The generator balances across the reference's full 2^-3..2^8 s
    bucket span (dqo/query_generator/rl/partitioner.py:31-36) — no
    clamp or overflow at the 91-300 s top buckets."""
    import random

    from deep_query_optimization_spark.generator.partitioner import Log2Partitioner

    p = Log2Partitioner(-3, 8)
    assert p.buckets == list(range(-3, 9))
    lo, hi = p.bounds(8)
    assert (lo, hi) == (128.0, 256.0)
    rng = random.Random(0)
    hist = {b: 0 for b in p.buckets}
    for _ in range(500):
        t = 2.0 ** rng.uniform(-4, 9)
        hist[p.bucket(t)] += 1
    assert all(hist[b] > 0 for b in p.buckets)
    assert p.bucket(300.0) == 8  # censored-at-cap rows credit the top bucket
