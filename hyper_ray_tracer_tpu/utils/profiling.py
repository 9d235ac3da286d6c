"""Profiling / observability helpers.

The reference's only instrumentation is a wall-clock log line after the last
tile (`/root/reference/src/application.rs:260-280`).  Here (SURVEY.md §5):

* ``trace()`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace (op-level TPU timeline); exposed via the
  CLI's ``--profile LOGDIR`` flag;
* ``Timer`` — phase timer that synchronises via a real device->host
  transfer (``block_until_ready`` does not reliably block on the tunneled
  axon device — docs/DESIGN.md §8);
* ``RayStats`` — rays/s accounting (camera rays, Mrays/s/chip), used by
  render_image's completion log.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for everything inside the block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock phase timer; call with pending device values to include
    device completion in the measurement.  Synchronisation materialises the
    values on the host (true sync even where block_until_ready is
    unreliable)."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def elapsed(self, *pending) -> float:
        if pending:
            import jax
            import numpy as _np

            for leaf in jax.tree.leaves(pending):
                _np.asarray(leaf)
        return time.perf_counter() - self._t0


@dataclasses.dataclass
class RayStats:
    camera_rays: int = 0
    depth: int = 0
    seconds: float = 0.0
    n_devices: int = 1

    @property
    def camera_mrays_per_s(self) -> float:
        return self.camera_rays / self.seconds / 1e6 if self.seconds else 0.0

    @property
    def camera_mrays_per_s_per_chip(self) -> float:
        return self.camera_mrays_per_s / max(self.n_devices, 1)

    def summary(self) -> str:
        return (
            f"{self.camera_rays} camera rays (depth<={self.depth}) in "
            f"{self.seconds:.2f}s = {self.camera_mrays_per_s:.2f} Mrays/s "
            f"({self.camera_mrays_per_s_per_chip:.2f} per chip, "
            f"{self.n_devices} devices)"
        )
