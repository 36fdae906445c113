"""CLI plumbing via click's CliRunner (fast paths only)."""

import numpy as np
from click.testing import CliRunner

from seq2squiggle_tpu.cli import main


def test_version():
    result = CliRunner().invoke(main, ["version"])
    assert result.exit_code == 0


def test_predict_requires_fasta_and_out():
    result = CliRunner().invoke(main, ["predict"])
    assert result.exit_code == 1


def test_show_advanced_options():
    result = CliRunner().invoke(main, ["predict", "--show-advanced-options"])
    assert result.exit_code == 0
    for flag in ("--noise-std", "--dwell-mean", "--duration-sampler",
                 "--min_duration", "--num-shards", "--trace-dir",
                 "--wire-format"):
        assert flag in result.output


def test_predict_end_to_end(tmp_path):
    out = tmp_path / "cli.slow5"
    result = CliRunner().invoke(
        main,
        ["predict", "/root/reference/example/test.fasta", "--read-input",
         "-o", str(out), "-m", "random", "-s", "5",
         "--predict-batch-size", "32"],
    )
    assert result.exit_code == 0, result.output
    from seq2squiggle_tpu.io.slow5 import read_slow5

    _, records = read_slow5(str(out))
    assert len(records) == 7


def test_preprocess_and_train_cli(tmp_path):
    import pandas as pd

    from test_preprocess import make_events

    events = tmp_path / "events.tsv"
    pd.concat(
        [make_events(160, seed=i, read_name=f"r{i}") for i in range(2)]
    ).to_csv(events, sep="\t", index=False)
    outdir = tmp_path / "npy"
    result = CliRunner().invoke(
        main, ["preprocess", str(events), str(outdir), "--chunksize", "160"]
    )
    assert result.exit_code == 0, result.output
    assert any(f.name.startswith("chunks-") for f in outdir.iterdir())

    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(
        "max_epochs: 1\ntrain_batch_size: 8\ncompute_dtype: float32\n"
        "max_chunks_valid: 20\n"
    )
    model = tmp_path / "ckpt" / "m.npz"
    result = CliRunner().invoke(
        main, ["train", str(outdir), "-y", str(cfg_file), "-m", str(model),
               "-s", "3"],
    )
    assert result.exit_code == 0, result.output
    assert model.exists()


def test_predict_wire_format_pinned_raw(tmp_path):
    """--wire-format raw must produce byte-identical signals to auto."""
    from seq2squiggle_tpu.io.slow5 import read_slow5

    sigs = []
    for name, flag in (("auto.slow5", "auto"), ("raw.slow5", "raw")):
        out = tmp_path / name
        result = CliRunner().invoke(
            main,
            ["predict", "/root/reference/example/test.fasta", "--read-input",
             "-o", str(out), "-m", "random", "-s", "5",
             "--predict-batch-size", "32", "--wire-format", flag],
        )
        assert result.exit_code == 0, result.output
        _, records = read_slow5(str(out))
        sigs.append([r["signal"] for r in records])
    for a, b in zip(*sigs):
        np.testing.assert_array_equal(a, b)
