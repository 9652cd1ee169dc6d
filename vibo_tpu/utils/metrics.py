"""Observability: meters, wall-clock timers, structured JSONL metrics.

Reference had printed/tqdm epoch metrics and time.time() brackets
(SURVEY.md section 6). Here: an AverageMeter (reference-family idiom), a
Timer that brackets device work with jax.block_until_ready (the only honest
way to time XLA), and a JSONL logger emitting one record per event
(step, elbo, kl terms, heldout-acc, cells/sec) for downstream analysis.
"""

from __future__ import annotations

import json
import time


class AverageMeter:
    """Tracks a running average (reference-family training-loop idiom)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class Timer:
    """Context manager timing a block; pass outputs through `sync` to make
    sure device work is included."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False

    @staticmethod
    def sync(x):
        import jax
        jax.block_until_ready(x)
        return x


class MetricsLogger:
    """Append-only JSONL metrics; also mirrors a short line to stdout."""

    def __init__(self, path: str | None = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh = open(path, "a") if path else None

    def log(self, **record):
        record.setdefault("time", time.time())
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self.echo:
            short = {k: (round(v, 4) if isinstance(v, float) else v)
                     for k, v in record.items() if k != "time"}
            print(" ".join(f"{k}={v}" for k, v in short.items()), flush=True)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
