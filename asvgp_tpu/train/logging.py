"""Structured metrics logging (SURVEY.md §5: metrics/observability row).

The reference logs via print() and pandas DataFrames
(electricity.py:145-174, eNATL60.py:104-124).  Here: a step-metrics dict
written as JSONL plus the same precompute/optimize/predict wall-time split
the reference reports (its de-facto benchmark schema).
"""

from __future__ import annotations

import json
import time


class MetricsLogger:
    """Append step metric dicts to a JSONL file (or collect in memory)."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.rows = []
        self._fh = open(path, "a") if path else None

    def log(self, step: int, **metrics):
        row = {"step": step, "time": time.time(), **{
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
        }}
        self.rows.append(row)
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()
        return row

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


class WallClock:
    """The reference's precompute/opt/pred timing bracket (eNATL60.py:85-102)."""

    def __init__(self):
        self.times = {}

    def section(self, name: str):
        logger = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *exc):
                logger.times[name] = logger.times.get(name, 0.0) + (
                    time.time() - self.t0
                )
                return False

        return _Ctx()

    def summary(self):
        total = sum(self.times.values())
        return {**self.times, "total": total}
