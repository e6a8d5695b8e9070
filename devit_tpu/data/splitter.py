"""Class-disjoint dataset partition — stage 1 of the pipeline.

Parity surface: reference `splite_dataset.py:51-66` — seed-42 Python
`random.shuffle` of the class-id list, split into `num_division` contiguous
chunks (the last chunk absorbs the remainder), then materialise per-division
datasets.

TPU-native restructuring: the reference copies every image file into
`sub-dataset{i}/{train,test}_dataset/<class>/` trees (splite_dataset.py:57-66).
Here the split is a *manifest* — per-division global class ids plus the
global->local label map — and division datasets are index views over the
original arrays. No file copying; the same manifest drives every stage.

Local label order matches the reference's ImageFolder semantics: class
directories are named str(global_label) and ImageFolder sorts names
LEXICOGRAPHICALLY, so local label 0 is the string-least global id
(documented reference behaviour, not a bug to fix — checkpoint compatibility
depends on it).
"""

from __future__ import annotations

import dataclasses
import json
import random
from typing import Dict, List, Sequence

import numpy as np


def split_classes(num_classes: int, num_division: int, seed: int = 42) -> List[List[int]]:
    """Seed-42-compatible contiguous chunk split (splite_dataset.py:51-56)."""
    rng = random.Random(seed)
    label_list = list(range(num_classes))
    rng.shuffle(label_list)
    n = num_classes
    # proportional i*n//D boundaries, the reference's formula verbatim at all
    # five of its dataset branches (for i = D-1 the end is exactly n, so no
    # special last-chunk case exists)
    return [label_list[i * n // num_division : (i + 1) * n // num_division]
            for i in range(num_division)]


def local_label_map(class_ids: Sequence[int]) -> Dict[int, int]:
    """global id -> local label, ordered like ImageFolder (string sort of
    directory names str(global_id))."""
    ordered = sorted(class_ids, key=str)
    return {g: i for i, g in enumerate(ordered)}


@dataclasses.dataclass
class DivisionManifest:
    """The whole stage-1 artifact."""

    num_classes: int
    num_division: int
    seed: int
    divisions: List[List[int]]  # global class ids per division

    @classmethod
    def create(cls, num_classes: int, num_division: int, seed: int = 42) -> "DivisionManifest":
        return cls(
            num_classes=num_classes,
            num_division=num_division,
            seed=seed,
            divisions=split_classes(num_classes, num_division, seed),
        )

    def classes(self, division: int) -> List[int]:
        return self.divisions[division]

    def label_map(self, division: int) -> Dict[int, int]:
        return local_label_map(self.divisions[division])

    def num_division_classes(self, division: int) -> int:
        return len(self.divisions[division])

    def global_label_of(self, division: int, local: int) -> int:
        ordered = sorted(self.divisions[division], key=str)
        return ordered[local]

    def division_to_global_matrix(self) -> np.ndarray:
        """(num_division, max_local) int matrix mapping local -> global label,
        -1 padded; used to scatter per-division logits into full-label space."""
        width = max(len(d) for d in self.divisions)
        mat = np.full((self.num_division, width), -1, dtype=np.int32)
        for d in range(self.num_division):
            ordered = sorted(self.divisions[d], key=str)
            mat[d, : len(ordered)] = ordered
        return mat

    def select_indices(self, labels: np.ndarray, division: int) -> np.ndarray:
        """Indices of samples whose global label belongs to this division."""
        mask = np.isin(labels, np.asarray(self.divisions[division]))
        return np.nonzero(mask)[0]

    def remap_labels(self, labels: np.ndarray, division: int) -> np.ndarray:
        """Global labels -> local labels for this division's samples."""
        m = self.label_map(division)
        lut = np.full(self.num_classes, -1, dtype=np.int64)
        for g, l in m.items():
            lut[g] = l
        out = lut[labels]
        assert (out >= 0).all(), "labels outside this division"
        return out

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f)

    @classmethod
    def load(cls, path: str) -> "DivisionManifest":
        with open(path) as f:
            return cls(**json.load(f))
