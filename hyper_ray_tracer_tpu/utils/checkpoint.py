"""Render checkpoint / resume.

The reference restarts the whole render on every resize and cannot resume
anything (`/root/reference/src/application.rs:357-391`; SURVEY.md §5).  Here
samples accumulate in chunks, and the running (radiance-sum, samples-done)
state is persisted at the snapshot cadence (RenderSettings.snapshot_every;
auto = every chunk with a preview, every 8 chunks otherwise — a pure
durability knob: the on-device f32 accumulation chain makes the values
independent of WHEN snapshots are taken), so long renders survive
preemption and resume bit-identically to an uninterrupted run
(counter-based RNG + schedule replay from the checkpoint meta).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional, Tuple

import numpy as np


def save_state(path: str, acc: np.ndarray, samples_done: int,
               meta: dict) -> None:
    """Atomically persist the accumulator (write temp + rename)."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(
                f, acc=acc, samples_done=np.int64(samples_done),
                meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
            )
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_state(path: str) -> Optional[Tuple[np.ndarray, int, dict]]:
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        acc = z["acc"]
        samples_done = int(z["samples_done"])
        meta = json.loads(z["meta"].tobytes().decode())
    return acc, samples_done, meta


def meta_matches(meta: dict, expected: dict) -> bool:
    return all(meta.get(k) == v for k, v in expected.items())
