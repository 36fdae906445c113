"""Pretrained-weights resolution: local cache, then GitHub releases.

Parity with the reference get_saved_weights (src/seq2squiggle/inference.py:
85-221): pick R10/R9 weights by profile keyword, prefer a version-matching
.ckpt in the local cache, otherwise stream the best-matching release asset
from the upstream GitHub repository (ZKI-PH-ImageAnalysis/seq2squiggle —
its published .ckpt files import directly via models/torch_import.py). Any
network failure degrades to a clear actionable error, since deployments may
be offline.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Optional

logger = logging.getLogger("seq2squiggle_tpu")

UPSTREAM_REPO = "ZKI-PH-ImageAnalysis/seq2squiggle"
# Version family whose released checkpoints match our architecture/config.
COMPAT_VERSION = ("0", "3", "4")
_RETRY_SLEEP = 2.0  # backoff before the single transient-error retry


def cache_dir() -> str:
    path = os.path.join(os.path.expanduser("~"), ".cache", "seq2squiggle_tpu")
    os.makedirs(path, exist_ok=True)
    return path


def profile_keyword(profile_name: str) -> Optional[str]:
    if profile_name.startswith("dna-r10"):
        return "R10"
    if profile_name.startswith("dna-r9"):
        return "R9"
    logger.warning(
        "Profile name '%s' does not match known patterns (R10-/R9-); "
        "proceeding with latest weights.", profile_name,
    )
    return None


def find_cached_weights(profile_name: str) -> Optional[str]:
    """Best version- and profile-matching cached checkpoint, if any.

    Ranking (deterministic, independent of directory order):
      - files versioned `@vX.Y.Z` in the compatible major family score by
        the number of leading version components matching COMPAT_VERSION
        (1-3); the highest wins, ties go to the lexicographically first;
      - unversioned .ckpt/.npz files score below every compatible
        versioned file but above nothing;
      - versioned files from a DIFFERENT major family are never picked
        (incompatible architecture).
    """
    keyword = profile_keyword(profile_name)
    best_path, best_score = None, -1.0
    for filename in sorted(os.listdir(cache_dir())):
        root, ext = os.path.splitext(filename)
        if ext not in (".ckpt", ".npz"):
            continue
        if keyword and keyword not in root:
            continue
        m = re.match(r".*@v(\d+)\.(\d+)\.(\d+)", root)
        if m:
            version = m.groups()
            if version[0] != COMPAT_VERSION[0]:
                continue  # different major family: incompatible
            score = float(
                sum(i == j for i, j in zip(COMPAT_VERSION, version))
            )
        else:
            score = 0.5  # unversioned: usable, below any version match
        if score > best_score:
            best_path = os.path.join(cache_dir(), filename)
            best_score = score
    return best_path


def _open_url(url: str, timeout: float):
    """urlopen with GitHub rate-limit detection (reference parity:
    inference.py:373-384 catches RateLimitExceededException and raises
    PermissionError with manual-download guidance) plus one retry on
    transient 5xx/connection errors."""
    import time
    import urllib.error
    import urllib.request

    for attempt in (0, 1):
        try:
            return urllib.request.urlopen(url, timeout=timeout)
        except urllib.error.HTTPError as exc:
            if (exc.code in (403, 429)
                    and exc.headers.get("X-RateLimit-Remaining") == "0"):
                raise PermissionError(
                    "GitHub API rate limit exceeded while trying to "
                    "download the model weights. Please download compatible "
                    "model weights manually from the seq2squiggle GitHub "
                    f"repository (https://github.com/{UPSTREAM_REPO}) and "
                    "specify these using the `--model` parameter"
                ) from exc
            if exc.code >= 500 and attempt == 0:
                time.sleep(_RETRY_SLEEP)
                continue
            raise
        except urllib.error.URLError:
            if attempt == 0:
                time.sleep(_RETRY_SLEEP)
                continue
            raise


def download_weights(profile_name: str) -> str:
    """Download the best release asset for the profile from GitHub."""
    import json
    import shutil

    keyword = profile_keyword(profile_name)
    api = f"https://api.github.com/repos/{UPSTREAM_REPO}/releases"
    logger.info(f"Querying {api} for model weights...")
    with _open_url(api, timeout=30) as resp:
        releases = json.load(resp)

    best = None  # (match, url, local_name)
    for release in releases:
        m = re.match(r"v(\d+)\.(\d+)\.(\d+)", release.get("tag_name", ""))
        if not m:
            continue
        rel_version = m.groups()
        match = (
            sum(i == j for i, j in zip(COMPAT_VERSION, rel_version))
            if rel_version[0] == COMPAT_VERSION[0]
            else 0
        )
        if best and match <= best[0]:
            continue
        for asset in release.get("assets", []):
            name, ext = os.path.splitext(asset["name"])
            if ext != ".ckpt":
                continue
            if keyword is None or keyword in asset["name"]:
                local = os.path.join(
                    cache_dir(), f"{name}@v{'.'.join(rel_version)}{ext}"
                )
                best = (match, asset["browser_download_url"], local)
                break
    if not best:
        raise FileNotFoundError(
            f"No matching model weights found in {UPSTREAM_REPO} releases "
            f"for profile {profile_name}."
        )
    _, url, local = best
    logger.info(f"Downloading model weights {local} from {url}")
    with _open_url(url, timeout=120) as resp, open(local, "wb") as fh:
        shutil.copyfileobj(resp, fh)
    return local


def resolve_pretrained(profile_name: str) -> str:
    """Cache lookup, then download; raises with guidance if both fail.

    A GitHub rate limit propagates as PermissionError (the reference's
    exact behavior, inference.py:373-384); other failures degrade to a
    FileNotFoundError with manual-download guidance.
    """
    cached = find_cached_weights(profile_name)
    if cached:
        logger.info(f"Found matching weights in local cache: {cached}")
        return cached
    try:
        return download_weights(profile_name)
    except PermissionError:
        raise
    except Exception as exc:
        raise FileNotFoundError(
            f"No model weights provided, none cached in {cache_dir()}, and "
            f"downloading from {UPSTREAM_REPO} failed ({exc}). Download a "
            ".ckpt release manually and pass it via --model, or use "
            "--model random for an untrained model."
        ) from exc
