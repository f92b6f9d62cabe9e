"""Training result records.

Capability parity with the reference ``wtracker/neural/train_results.py:4-35``.
"""

from __future__ import annotations

from typing import List, NamedTuple


class BatchResult(NamedTuple):
    """Result of one batch: loss and number of "correct" predictions
    (within 1 px of the target center, training.py:317)."""

    loss: float
    num_correct: int


class EpochResult(NamedTuple):
    """Per-batch losses and overall accuracy of one epoch."""

    losses: List[float]
    accuracy: float


class FitResult(NamedTuple):
    """Multi-epoch fit summary: losses per batch and accuracy per epoch."""

    num_epochs: int
    train_loss: List[float]
    train_acc: List[float]
    test_loss: List[float]
    test_acc: List[float]
