"""Curriculum-learning samplers: pure host-side index state.

Re-design of /root/reference/AutoEncoder/encdec/DynamicSampler.py:29-96 and
the curriculum logic in trainers/encdec.py:204-296. The compiled train step
never sees any of this — shapes stay static; only which example indices feed
each batch changes, which is exactly what a host-side sampler is for.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np


class CurriculumState:
    """Tracks which dataset indices are in the current curriculum.

    Reference persistence format: one index per line in training_idxes.txt
    (AutoEncoder/data/dataset.py:66-73).
    """

    def __init__(self, dataset_size: int, initial: Sequence[int] | None = None):
        self.dataset_size = dataset_size
        self.training_idxes: List[int] = sorted(set(initial or []))

    @property
    def complement(self) -> List[int]:
        cur = set(self.training_idxes)
        return [i for i in range(self.dataset_size) if i not in cur]

    def add(self, idxes: Sequence[int]) -> None:
        cur = set(self.training_idxes)
        cur.update(int(i) for i in idxes)
        self.training_idxes = sorted(cur)

    def add_easiest(self, candidate_idxes: Sequence[int], losses: Sequence[float], k: int):
        """Add the k lowest-loss candidates (encdec.py:293-296: 100 easiest)."""
        order = np.argsort(np.asarray(losses))[:k]
        self.add([candidate_idxes[i] for i in order])

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            for i in self.training_idxes:
                f.write(f"{i}\n")

    @classmethod
    def load(cls, path: str, dataset_size: int) -> "CurriculumState":
        with open(path) as f:
            idxes = [int(line) for line in f if line.strip()]
        return cls(dataset_size, idxes)


class SequenceSamplerTrain:
    """Shuffled iteration over the current curriculum (DynamicSampler.py:44-57)."""

    def __init__(self, state: CurriculumState, rng: np.random.Generator):
        self.state = state
        self.rng = rng

    def __iter__(self) -> Iterator[int]:
        idxes = np.array(self.state.training_idxes)
        self.rng.shuffle(idxes)
        return iter(idxes.tolist())

    def __len__(self) -> int:
        return len(self.state.training_idxes)


class SequenceSamplerComplement:
    """Ordered iteration over not-yet-included samples for the curriculum
    validation pass (DynamicSampler.py:29-42)."""

    def __init__(self, state: CurriculumState):
        self.state = state

    def __iter__(self) -> Iterator[int]:
        return iter(self.state.complement)

    def __len__(self) -> int:
        return len(self.state.complement)


class WeightedDynamicSampler:
    """Loss-weighted sampling alternative (DynamicSampler.py:59-87)."""

    def __init__(self, dataset_size: int, rng: np.random.Generator):
        self.weights = np.ones(dataset_size, dtype=np.float64)
        self.rng = rng

    def update_weights(self, idxes: Sequence[int], losses: Sequence[float]) -> None:
        self.weights[np.asarray(idxes)] = np.asarray(losses)

    def sample(self, n: int) -> np.ndarray:
        p = self.weights / self.weights.sum()
        return self.rng.choice(len(p), size=n, p=p)


def batched(indices: Iterator[int], batch_size: int, drop_last: bool = False):
    """Group an index stream into batches (DynamicBatchSampler equivalent,
    DynamicSampler.py:90-96)."""
    batch: List[int] = []
    for i in indices:
        batch.append(i)
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch and not drop_last:
        yield batch
