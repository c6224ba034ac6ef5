"""Observability: CSV epoch logs (the reference's txt channel,
cmu-mosei/run.py:394-396,411-412), optional TensorBoard scalars (its
SummaryWriter channel), throughput counters, and jax.profiler hooks."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional


class RunLogger:
    """Writes `<dir>/<name>.csv` with epoch,train_loss,valid_loss(,extras) and
    mirrors scalars to TensorBoard when available."""

    def __init__(self, log_dir: str, name: str, *, tensorboard: bool = True):
        """TensorBoard mirrors by default — the reference always writes TB
        scalars alongside its txt log (cmu-mosei/run.py:397,408); falls back
        silently to CSV-only when no TB writer is importable."""
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.csv")
        self.name = name
        with open(self.path, "w") as f:
            f.write("epoch,train_loss,valid_loss,samples_per_sec\n")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log_epoch(self, epoch: int, stats) -> None:
        with open(self.path, "a") as f:
            f.write(f"{epoch + 1},{stats.train_loss:.6f},{stats.valid_loss:.6f},"
                    f"{stats.samples_per_sec:.2f}\n")
        if self._tb is not None:
            self._tb.add_scalars(self.name, {"train_loss": stats.train_loss,
                                             "valid_loss": stats.valid_loss}, epoch)

    def close(self):
        if self._tb is not None:
            self._tb.close()


class Throughput:
    """samples/sec/chip counter — the BASELINE metric."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = n_chips
        self.samples = 0
        self.t0 = time.perf_counter()

    def add(self, n: int):
        self.samples += n

    def per_chip(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.samples / max(dt, 1e-9) / self.n_chips


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None.  View the dump
    with Perfetto / TensorBoard profile plugin."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    """The framework's race/sanitizer analogue: jax_debug_nans fails fast on
    the first NaN-producing op (SURVEY §5)."""
    import jax

    jax.config.update("jax_debug_nans", enable)
