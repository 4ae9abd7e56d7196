"""Phase timers + device memory reporting (reference `utils/func.py:42-79`,
TPU-native: block_until_ready barriers + jax device memory_stats; optional
jax.profiler trace capture)."""

from __future__ import annotations

import contextlib
from time import time

import jax


def device_mem_gb() -> tuple:
    """(allocated GB, limit GB) of the default device; (0,0) if unsupported."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        alloc = stats.get("bytes_in_use", 0) / 1024 ** 3
        limit = stats.get("bytes_limit", 0) / 1024 ** 3
        return alloc, limit
    except Exception:
        return 0.0, 0.0


def sync():
    """Barrier over all live arrays on the default backend."""
    try:
        jax.effects_barrier()
    except Exception:
        pass


class TimeStamp:
    """Phase timer: `tt = TimeStamp(); ...; tt("phase", denominator=n)`."""

    def __init__(self, verbose: bool = True, precision: int = 1,
                 unit: str = "s"):
        self.verbose = verbose
        self.precision = precision
        self.unit = unit
        self.set()

    def set(self):
        if self.verbose:
            sync()
            self.start = time()

    def elapsed(self, denominator: float = 1.0) -> float:
        val = time() - self.start
        if self.unit == "ms":
            val *= 1000
        return round(val / denominator, self.precision)

    def __call__(self, msg: str = "", denominator: float = 1.0):
        if self.verbose:
            sync()
            alloc, limit = device_mem_gb()
            tt = self.elapsed(denominator)
            print(f"## Time: {tt}{self.unit}. Mem: {alloc:.2f}/{limit:.2f} GB."
                  f" [{msg}]", flush=True)
            self.set()


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace around a region (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
