"""standardize-events tool and offline sweep."""

import numpy as np
import pandas as pd
import pytest

from seq2squiggle_tpu.tools.standardize_events import (
    parse_sigtk_file,
    standardize_and_write_chunks,
)


def _events(tmp_path, n=30):
    rng = np.random.default_rng(0)
    rows = []
    pos = 0
    for i in range(n):
        c = int(rng.integers(2, 100))  # some events exceed filter_length=70
        samples = rng.normal(0, 1, c).round(4)
        rows.append(dict(
            read_name="r", position=i, model_kmer="ACGTACGTA",
            start_idx=pos, end_idx=pos + c, event_stdv=1.0,
            samples=",".join(map(str, samples)),
        ))
        pos += c
    df = pd.DataFrame(rows)
    path = tmp_path / "events.tsv"
    df.to_csv(path, sep="\t", index=False)
    return df, path


def test_parse_sigtk(tmp_path):
    f = tmp_path / "sigtk.txt"
    f.write_text("read1 x 91.25 y z 12.5 rest\n")
    assert parse_sigtk_file(str(f)) == (91.25, 12.5)
    assert parse_sigtk_file(str(tmp_path / "missing")) == (0.0, 0.0)


def test_standardize_denormalizes_and_filters(tmp_path):
    df, path = _events(tmp_path)
    out = tmp_path / "out.tsv"
    standardize_and_write_chunks(str(path), str(out), chunk_size=7,
                                 pa_mean=90.0, pa_std=10.0, filter_length=70)
    res = pd.read_csv(out, sep="\t")
    lengths = df["end_idx"] - df["start_idx"]
    assert len(res) == int((lengths <= 70).sum())
    # first kept row: samples denormalized, stdv = ddof-1 stdev of samples
    first_kept = df[lengths <= 70].iloc[0]
    orig = np.array([float(x) for x in first_kept["samples"].split(",")])
    got = np.array([float(x) for x in res.iloc[0]["samples"].split(",")])
    np.testing.assert_allclose(got, orig * 10.0 + 90.0, rtol=1e-9)
    np.testing.assert_allclose(res.iloc[0]["event_stdv"],
                               np.std(orig * 10.0 + 90.0, ddof=1), rtol=1e-9)


def test_standardize_passthrough_without_stats(tmp_path):
    df, path = _events(tmp_path)
    out = tmp_path / "out.tsv"
    standardize_and_write_chunks(str(path), str(out), chunk_size=100,
                                 pa_mean=0.0, pa_std=0.0, filter_length=70)
    res = pd.read_csv(out, sep="\t")
    lengths = df["end_idx"] - df["start_idx"]
    kept = df[lengths <= 70].reset_index(drop=True)
    assert res["samples"].tolist() == kept["samples"].tolist()


def test_offline_sweep(tmp_path):
    import yaml

    from test_preprocess import make_events
    from seq2squiggle_tpu.config import load_config
    from seq2squiggle_tpu.train.preprocess import build_chunkset, save_chunkset
    from seq2squiggle_tpu.train.sweep import sweep_run

    cfg = load_config(None)
    cfg.update(dict(compute_dtype="float32", train_batch_size=8, max_epochs=1,
                    max_chunks_valid=20))
    outdir = tmp_path / "npy"
    for i in range(2):
        data = build_chunkset(make_events(16 * 6, seed=i), cfg, False, False)
        save_chunkset(data, str(outdir), i)

    space = {
        "train_dir": str(outdir),
        "parameters": {"lr": {"values": [1e-3, 5e-4]},
                       "dff": {"value": 256}},
    }
    sweep_file = tmp_path / "sweep.yaml"
    sweep_file.write_text(yaml.safe_dump(space))
    sweep_run(str(sweep_file), count=2, config=cfg, seed=0)
    results = (tmp_path / "sweep_results.jsonl").read_text().strip().splitlines()
    assert len(results) == 2


def _sweep_setup(tmp_path):
    import yaml  # noqa: F401

    from test_preprocess import make_events
    from seq2squiggle_tpu.config import load_config
    from seq2squiggle_tpu.train.preprocess import build_chunkset, save_chunkset

    cfg = load_config(None)
    cfg.update(dict(compute_dtype="float32", train_batch_size=8, max_epochs=2,
                    max_chunks_valid=20))
    outdir = tmp_path / "npy"
    for i in range(2):
        data = build_chunkset(make_events(16 * 6, seed=i), cfg, False, False)
        save_chunkset(data, str(outdir), i)
    return cfg, outdir


def test_offline_sweep_grid(tmp_path):
    import json

    import yaml

    from seq2squiggle_tpu.train.sweep import sweep_run

    cfg, outdir = _sweep_setup(tmp_path)
    cfg["max_epochs"] = 1
    space = {
        "train_dir": str(outdir),
        "method": "grid",
        "parameters": {"lr": {"values": [1e-3, 5e-4]},
                       "dff": {"values": [128, 256]}},
    }
    sweep_file = tmp_path / "sweep.yaml"
    sweep_file.write_text(yaml.safe_dump(space))
    sweep_run(str(sweep_file), count=10, config=cfg, seed=0)
    rows = [json.loads(line) for line in
            (tmp_path / "sweep_results.jsonl").read_text().splitlines()]
    assert len(rows) == 4  # full 2x2 grid (count caps, not pads)
    combos = {(r["params"]["lr"], r["params"]["dff"]) for r in rows}
    assert combos == {(1e-3, 128), (1e-3, 256), (5e-4, 128), (5e-4, 256)}


def test_bayes_encoding_and_proposal_minimises():
    """Unit test of the bayes machinery without any training: the GP+EI
    proposer should concentrate near the minimum of a smooth 1-D bowl
    far faster than the prior's uniform spread."""
    import random

    from seq2squiggle_tpu.train.sweep import _bayes_encoding, _bayes_propose

    params = {"lr": {"min": 1e-5, "max": 1e-1, "distribution": "log_uniform"},
              "dff": {"value": 256}}
    dims, decode = _bayes_encoding(params)
    assert [d[0] for d in dims] == ["lr"]  # fixed param excluded
    assert decode([0.0])["lr"] == pytest.approx(1e-5)
    assert decode([1.0])["lr"] == pytest.approx(1e-1)
    assert decode([0.5])["dff"] == 256

    rng = random.Random(0)
    target = 0.3

    def f(u):
        return (u[0] - target) ** 2

    X = [[rng.random()] for _ in range(4)]
    y = [f(x) for x in X]
    props = []
    for _ in range(8):
        u = _bayes_propose(X, y, 1, rng)
        X.append(list(u))
        y.append(f(u))
        props.append(u[0])
    # the last proposals sit near the bowl's bottom
    assert min(abs(p - target) for p in props[-4:]) < 0.05
    assert min(y) < min(y[:4])


def test_offline_sweep_bayes(tmp_path):
    import json

    import yaml

    from seq2squiggle_tpu.train.sweep import sweep_run

    cfg, outdir = _sweep_setup(tmp_path)
    cfg["max_epochs"] = 1
    space = {
        "train_dir": str(outdir),
        "method": "bayes",
        "n_init": 2,
        "parameters": {"lr": {"min": 1e-4, "max": 1e-2,
                              "distribution": "log_uniform"},
                       "dff": {"value": 256}},
    }
    sweep_file = tmp_path / "sweep.yaml"
    sweep_file.write_text(yaml.safe_dump(space))
    sweep_run(str(sweep_file), count=3, config=cfg, seed=0)
    rows = [json.loads(line) for line in
            (tmp_path / "sweep_results.jsonl").read_text().splitlines()]
    assert len(rows) == 3
    for r in rows:
        assert 1e-4 <= r["params"]["lr"] <= 1e-2
        assert r["params"]["dff"] == 256
        assert len(r["point"]) == 1  # the encoded point is recorded
    # trial 2 was GP-proposed from trials 0-1 (just shape/record checks
    # here; the optimisation behaviour is pinned by the unit test above)


def test_offline_sweep_halving(tmp_path):
    import json

    import yaml

    from seq2squiggle_tpu.train.sweep import sweep_run

    cfg, outdir = _sweep_setup(tmp_path)
    space = {
        "train_dir": str(outdir),
        "method": "halving",
        "eta": 2,
        "min_epochs": 1,
        "parameters": {"lr": {"values": [1e-3, 5e-4, 1e-4, 5e-5]}},
    }
    sweep_file = tmp_path / "sweep.yaml"
    sweep_file.write_text(yaml.safe_dump(space))
    sweep_run(str(sweep_file), count=4, config=cfg, seed=0)
    rows = [json.loads(line) for line in
            (tmp_path / "sweep_results.jsonl").read_text().splitlines()]
    # rungs: 4 trials @1 epoch -> 2 @2 epochs -> 1 @2 (capped by max_epochs)
    assert [r["rung"] for r in rows] == [0, 0, 0, 0, 1, 1, 2]
    assert [r["epochs"] for r in rows] == [1, 1, 1, 1, 2, 2, 2]
    # each rung's survivors are the best scorers of the previous rung
    r0 = sorted(rows[:4], key=lambda r: r["metrics"]["valid_total_loss"])
    kept = {json.dumps(r["params"], sort_keys=True) for r in rows[4:6]}
    assert kept == {json.dumps(r["params"], sort_keys=True) for r in r0[:2]}
