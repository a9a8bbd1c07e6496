"""Structured metrics logging (absent from the reference — SURVEY.md §5.5
"No structured logging"). JSONL writer for per-epoch/per-step metrics,
consumable by any downstream dashboarding."""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricsLogger:
    def __init__(self, path: Path | str, *, context: dict | None = None):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.context = context or {}
        self._fh = open(self.path, "a", buffering=1)

    def log(self, record: dict) -> None:
        rec = {"ts": time.time(), **self.context, **record}
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
