"""Measure cold-compile latency of the bench forward path, per program.

Run with HRT_NO_COMPILE_CACHE=1 to simulate the driver's cold-cache
environment (VERDICT r4 weak #2: the round-4 driver bench timed out at
rc=124 before printing anything).  Logs every XLA compile with its wall
time so the shape census in DESIGN.md's compile budget can be verified.

Usage: HRT_NO_COMPILE_CACHE=1 python tools/prof_cold_compile.py
"""

from __future__ import annotations

import logging
import sys
import time

t00 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[{time.perf_counter() - t00:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_log_compiles", True)
logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.dispatch").setLevel(logging.DEBUG)
logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.DEBUG)

from hyper_ray_tracer_tpu import build_scene  # noqa: E402
from hyper_ray_tracer_tpu.camera import make_basis  # noqa: E402
from hyper_ray_tracer_tpu.render import (  # noqa: E402
    block_order,
    make_compacting_renderer,
    prepare_scene,
)

W, H, SPP, DEPTH = 400, 225, 16, 10

log("imports done")
scene = build_scene("final")
arrays, bvh, mode = prepare_scene(scene)
basis = make_basis(scene.camera, W, H)
log(f"scene built, mode={mode}")
run = make_compacting_renderer(scene, W, H, DEPTH, mode)
perm = jax.device_put(jnp.asarray(block_order(W, H)))
arrays, bvh, basis = jax.device_put((arrays, bvh, basis))
log("device_put done; starting warmup rep (compiles everything)")
out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
log(f"warmup rep done, mean={float(out.mean()):.4f}")
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
    best = min(best, time.perf_counter() - t0)
log(f"best rep {best*1e3:.1f} ms = {W*H*SPP/best/1e6:.3f} Mrays/s")
