"""Shared utilities: dataset metadata, prior-shift calibration, feature masks."""

from .metadata import MetaData, FEATURE_NAMES  # noqa: F401
from .calibration import bayes_prior_shift  # noqa: F401
