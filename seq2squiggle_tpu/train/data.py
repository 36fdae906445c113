"""Training data loading: memmapped .npy chunk files.

Equivalent of the reference's load_numpy + ChunkDataSetMemmap
(src/seq2squiggle/dataloader.py:152-259,456-574): glob prefix-matched .npy
files, optionally split the FILE LISTS into train/valid (sklearn
train_test_split with the config seed, matching the reference), memmap
everything, and serve shuffled fixed-size batches. Targets and stdevs are
scaled by 1/scaling_max_value exactly as the reference does per sample.

Batches are numpy dicts ready for device_put; the final partial batch is
padded and carries a sample mask so jitted train steps keep static shapes.
"""

from __future__ import annotations

import logging
import os
from bisect import bisect
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

logger = logging.getLogger("seq2squiggle_tpu")

_PREFIXES = ("chunks-", "targets-", "chunks_lengths-", "targets_lengths-",
             "stdevs-")
_KEYS = ("chunks", "targets", "chunks_lengths", "targets_lengths", "stdevs")


def _load_paths(directory: str, prefix: str) -> List[str]:
    paths = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.startswith(prefix) and f.endswith(".npy")
    )
    # Also accept unbatched legacy names like "chunks.npy"
    bare = os.path.join(directory, prefix.rstrip("-") + ".npy")
    if not paths and os.path.exists(bare):
        paths = [bare]
    return paths


def load_file_groups(
    train_dir: str,
    valid_dir: Optional[str],
    train_valid_split: float,
    seed: int,
) -> Tuple[Dict[str, List[str]], Dict[str, List[str]]]:
    """File lists per array kind for train and valid.

    When no valid_dir is given, the *file lists* are split (reference
    dataloader.py:509-535) — requires at least 2 files per kind.
    """
    train = {k: _load_paths(train_dir, p) for k, p in zip(_KEYS, _PREFIXES)}
    if not train["chunks"]:
        raise FileNotFoundError(f"No chunks-*.npy files found in {train_dir}")

    if valid_dir and os.path.exists(valid_dir):
        valid = {k: _load_paths(valid_dir, p) for k, p in zip(_KEYS, _PREFIXES)}
        return train, valid

    if len(train["chunks"]) < 2:
        raise ValueError(
            "No valid_dir given and only one training file per kind; the "
            "file-level train/valid split needs >= 2 files. Run preprocess "
            "with batches (default) or provide a valid_dir."
        )
    from sklearn.model_selection import train_test_split

    valid = {}
    for key in _KEYS:
        train[key], valid[key] = train_test_split(
            train[key], train_size=train_valid_split, random_state=seed
        )
        train[key] = sorted(train[key])
        valid[key] = sorted(valid[key])
    return train, valid


class ChunkDataset:
    """Memmapped multi-file chunk dataset with bisect index routing."""

    def __init__(self, files: Dict[str, List[str]], max_limit: int,
                 config: dict):
        self.maps = {
            key: [np.load(p, mmap_mode="r") for p in paths]
            for key, paths in files.items()
        }
        self.config = config
        self.start_indices = []
        count = 0
        for m in self.maps["chunks"]:
            self.start_indices.append(count)
            count += m.shape[0]
        self.data_count = count
        self.max_limit = max_limit

    def __len__(self) -> int:
        if 0 < self.max_limit < self.data_count:
            return self.max_limit
        return self.data_count

    def get_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        """Gather one batch. Scaling matches dataloader.py:243-246."""
        scale = self.config["scaling_max_value"]
        out = {k: [] for k in _KEYS}
        for idx in indices:
            f = bisect(self.start_indices, int(idx)) - 1
            j = int(idx) - self.start_indices[f]
            for key in _KEYS:
                out[key].append(self.maps[key][f][j])
        batch = {
            "chunks": np.stack(out["chunks"]).astype(np.float32),
            "targets": (np.stack(out["targets"]).astype(np.float32) / scale)[
                ..., None
            ],
            "chunks_lengths": np.stack(out["chunks_lengths"]).astype(np.int32),
            "targets_lengths": np.asarray(out["targets_lengths"], np.int32),
            "stdevs": np.stack(out["stdevs"]).astype(np.float32) / scale,
        }
        return batch


def epoch_batches(
    dataset: ChunkDataset,
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool = True,
) -> Iterator[Tuple[Dict[str, np.ndarray], np.ndarray]]:
    """Yield (batch, sample_mask) with static batch_size (last batch padded)."""
    n = len(dataset)
    order = rng.permutation(n) if shuffle else np.arange(n)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        mask = np.ones(batch_size, np.float32)
        if len(idx) < batch_size:
            pad = batch_size - len(idx)
            mask[len(idx) :] = 0.0
            idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
        yield dataset.get_batch(idx), mask
