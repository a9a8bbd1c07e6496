"""Bayes prior-shift score calibration.

Parity: /root/reference/src/utils.py:52-56 — rescales sigmoid scores from
the training class prior to a deployment prior.
"""

from __future__ import annotations

import numpy as np


def bayes_prior_shift(scores, train_prior: float, test_prior: float):
    """Returns (calibrated_scores, prior_ratio)."""
    train_neg = 1.0 - train_prior
    test_neg = 1.0 - test_prior
    prior_ratio = (test_prior / test_neg) / (train_prior / train_neg)
    scores = np.asarray(scores)
    return scores * prior_ratio / (scores * prior_ratio + (1.0 - scores)), prior_ratio
