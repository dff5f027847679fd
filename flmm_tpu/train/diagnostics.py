"""Observability: timers, JSON metric logging, profiler hooks, NaN guards.

The reference's only observability is mmengine IterTimerHook + LoggerHook
every 10 iters and `error_if_nonfinite=False` grad clipping (SURVEY.md
section 5).  Here:

* ``StepTimer``: wall-clock + rolling throughput.
* ``MetricLogger``: JSONL metric stream (stdout and/or file).
* ``profile``: context manager around ``jax.profiler.trace`` for xplane
  dumps viewable in XProf/TensorBoard.
* ``nonfinite_guard``: optax wrapper skipping updates when grads are not
  finite (the bf16-era replacement for dynamic loss scaling).
"""

from __future__ import annotations

import contextlib
import json
import pathlib
import time
from typing import IO

import jax
import optax


class StepTimer:
    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(1, len(self.times))


class MetricLogger:
    def __init__(self, path: str | None = None, stream: IO | None = None,
                 interval: int = 10):
        self.interval = interval
        self.file = open(path, "a") if path else None
        self.stream = stream

    def log(self, step: int, metrics: dict) -> None:
        if step % self.interval != 0:
            return
        rec = {"step": step}
        rec.update({k: float(v) for k, v in metrics.items()})
        line = json.dumps(rec)
        if self.file:
            self.file.write(line + "\n")
            self.file.flush()
        if self.stream:
            print(line, file=self.stream, flush=True)

    def close(self):
        if self.file:
            self.file.close()


@contextlib.contextmanager
def profile(logdir: str | pathlib.Path, enabled: bool = True):
    """Capture an XLA trace for XProf/TensorBoard."""
    if not enabled:
        yield
        return
    pathlib.Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nonfinite_guard(
    inner: optax.GradientTransformation, max_consecutive_errors: int = 5
) -> optax.GradientTransformation:
    """Skip optimizer updates when gradients contain NaN/inf.

    Mirrors the robustness intent of the reference's AMP dynamic loss scale
    + ``error_if_nonfinite=False`` (configs/...:185-187): a bad step is
    dropped rather than corrupting the state; persistent non-finiteness
    raises through apply_if_finite's error counter.
    """
    return optax.apply_if_finite(inner, max_consecutive_errors)
