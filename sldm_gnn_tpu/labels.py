"""Label space for driving-event classification.

Parity: /root/reference/src/labels.py:3-7 (4-event bitmask label space).
"""

from enum import IntEnum


class LabelsEnum(IntEnum):
    LANE_CHANGE = 0
    OVERTAKE = 1
    TURN = 2
    COLLISION = 3


ALL_LABELS = [lb.value for lb in LabelsEnum]


def decode_bitmask(mlb: int, active_labels: list[int]) -> list[float]:
    """Decode an ``MLBEncoded`` integer bitmask into a multi-hot vector
    over ``active_labels`` (reference: src/gbuilder.py:124-131)."""
    return [1.0 if (int(mlb) & (1 << int(c))) else 0.0 for c in active_labels]


def label_name(value: int) -> str:
    """Human-readable label name (reference: src/utils.py:170-174)."""
    try:
        return LabelsEnum(value).name
    except ValueError:
        return "UNKNOWN_LABEL"
