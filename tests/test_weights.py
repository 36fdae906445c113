"""Pretrained-weights resolution: cache matching by version + profile."""

import os

import pytest

from seq2squiggle_tpu.io import weights as w


@pytest.fixture
def fake_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(w, "cache_dir", lambda: str(tmp_path))
    return tmp_path


def _touch(path):
    path.write_bytes(b"x")


def test_profile_keyword():
    assert w.profile_keyword("dna-r10-min") == "R10"
    assert w.profile_keyword("dna-r9-prom") == "R9"
    assert w.profile_keyword("rna-004-min") is None


def test_cache_prefers_matching_profile_and_version(fake_cache):
    _touch(fake_cache / "seq2squiggle-R9@v0.3.4.ckpt")
    _touch(fake_cache / "seq2squiggle-R10@v0.3.4.ckpt")
    _touch(fake_cache / "seq2squiggle-R10@v0.2.0.ckpt")
    found = w.find_cached_weights("dna-r10-min")
    assert found.endswith("seq2squiggle-R10@v0.3.4.ckpt")
    found = w.find_cached_weights("dna-r9-min")
    assert found.endswith("seq2squiggle-R9@v0.3.4.ckpt")


def test_cache_miss_returns_none(fake_cache):
    assert w.find_cached_weights("dna-r10-min") is None
    _touch(fake_cache / "notes.txt")
    assert w.find_cached_weights("dna-r10-min") is None


def test_resolve_raises_offline(fake_cache, monkeypatch):
    def boom(_):
        raise OSError("no network")

    monkeypatch.setattr(w, "download_weights", boom)
    with pytest.raises(FileNotFoundError, match="--model"):
        w.resolve_pretrained("dna-r10-min")
