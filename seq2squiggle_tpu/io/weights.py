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
    """Best version- and profile-matching cached checkpoint, if any."""
    keyword = profile_keyword(profile_name)
    best = (None, 0)
    for filename in sorted(os.listdir(cache_dir())):
        root, ext = os.path.splitext(filename)
        if ext not in (".ckpt", ".npz"):
            continue
        m = re.match(r".*@v(\d+)\.(\d+)\.(\d+)", root)
        file_version = m.groups() if m else ()
        match = (
            sum(i == j for i, j in zip(COMPAT_VERSION, file_version))
            if file_version and file_version[0] == COMPAT_VERSION[0]
            else 0
        )
        if keyword and keyword not in root:
            continue
        if match > best[1] or (best[0] is None and not m):
            best = (os.path.join(cache_dir(), filename), match)
    return best[0]


def download_weights(profile_name: str) -> str:
    """Download the best release asset for the profile from GitHub."""
    import json
    import shutil
    import urllib.request

    keyword = profile_keyword(profile_name)
    api = f"https://api.github.com/repos/{UPSTREAM_REPO}/releases"
    logger.info(f"Querying {api} for model weights...")
    with urllib.request.urlopen(api, timeout=30) as resp:
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
    with urllib.request.urlopen(url, timeout=120) as resp, open(local, "wb") as fh:
        shutil.copyfileobj(resp, fh)
    return local


def resolve_pretrained(profile_name: str) -> str:
    """Cache lookup, then download; raises with guidance if both fail."""
    cached = find_cached_weights(profile_name)
    if cached:
        logger.info(f"Found matching weights in local cache: {cached}")
        return cached
    try:
        return download_weights(profile_name)
    except Exception as exc:
        raise FileNotFoundError(
            f"No model weights provided, none cached in {cache_dir()}, and "
            f"downloading from {UPSTREAM_REPO} failed ({exc}). Download a "
            ".ckpt release manually and pass it via --model, or use "
            "--model random for an untrained model."
        ) from exc
