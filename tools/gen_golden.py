"""Generate the committed 160x90 golden oracle renders (tests/golden/).

The scalar oracle (hyper_ray_tracer_tpu/oracle.py) is the trusted
re-implementation of the reference's recursive integrator
(/root/reference/src/application.rs:477-495); these renders pin its output
at a visually meaningful size so any future renderer optimisation that
drifts at image scale is caught by tests/test_golden.py, not just the
postage-stamp parity tiles.

Run from the repo root:  python tools/gen_golden.py
(~1 h of CPU; scenes run in parallel worker processes).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

GOLDEN_DIR = Path(__file__).resolve().parents[1] / "tests" / "golden"

# scene, W, H, spp, depth  — mirrors tests/test_golden.py CASES exactly.
CASES = [
    ("three-spheres", 160, 90, 4, 8),
    ("two-spheres", 160, 90, 4, 8),
    ("two-perlin-spheres", 160, 90, 4, 8),
    ("earth", 160, 90, 4, 8),
    ("simple-light", 160, 90, 4, 8),
    ("cornell", 160, 90, 4, 8),
    ("cornell-smoke", 160, 90, 4, 8),
    ("random", 160, 90, 2, 8),
    ("final", 160, 90, 1, 5),
    ("sphereflake-small", 160, 90, 4, 8),
]


def _render(case):
    name, w, h, spp, depth = case
    # spawn workers don't inherit the cwd-based import path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax

    jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel
    import numpy as np

    from hyper_ray_tracer_tpu import build_scene
    from hyper_ray_tracer_tpu.oracle import Oracle

    t0 = time.perf_counter()
    img = Oracle(build_scene(name), w, h).render(spp, depth, seed=0)
    out = GOLDEN_DIR / f"{name}_{w}x{h}_{spp}spp_d{depth}.npy"
    np.save(out, img.astype(np.float32))
    return name, time.perf_counter() - t0


def main() -> int:
    GOLDEN_DIR.mkdir(exist_ok=True)
    # Heaviest first so the pool tail isn't one long straggler.
    order = sorted(CASES, key=lambda c: c[0] != "final")
    with mp.get_context("spawn").Pool(min(os.cpu_count() or 1, 8)) as pool:
        for name, dt in pool.imap_unordered(_render, order):
            print(f"{name}: {dt:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
