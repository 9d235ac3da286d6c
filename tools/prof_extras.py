"""Measure the bench extras' cold cost and dump the canned schedules.

Prints, for the bench configs:
  * the forward partitioned schedule (pre, entries) for n0 = 1.44M
  * the training psched for depth 8 and depth 50 at 720k lanes
  * wall-clock of each extras stage (probe, train-step compile, reps)

The schedules are deterministic functions of (scene, shape, seed,
RENDER_FORMAT_VERSION): bench.py embeds them as data so the driver run
skips the serial probe compile (~150 s cold); the on-device overflow
tripwire re-probes if they ever go stale.

Usage: [HRT_NO_COMPILE_CACHE=1] python -m tools.prof_extras [fwd|d8|d50]
"""

from __future__ import annotations

import sys
import time

t00 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[{time.perf_counter() - t00:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from hyper_ray_tracer_tpu import build_scene  # noqa: E402
from hyper_ray_tracer_tpu.camera import make_basis  # noqa: E402
from hyper_ray_tracer_tpu.render import (  # noqa: E402
    block_order,
    make_compacting_renderer,
    prepare_scene,
)
from hyper_ray_tracer_tpu.train import (  # noqa: E402
    make_train_step,
    measure_partition_schedule,
)

which = sys.argv[1] if len(sys.argv) > 1 else "all"

scene = build_scene("final")
arrays, bvh, mode = prepare_scene(scene)
log(f"scene built, mode={mode}")

if which in ("fwd", "all"):
    W, H, SPP, DEPTH = 400, 225, 16, 10
    basis = make_basis(scene.camera, W, H)
    run = make_compacting_renderer(scene, W, H, DEPTH, mode)
    perm = jax.device_put(jnp.asarray(block_order(W, H)))
    a2, b2, ba2 = jax.device_put((arrays, bvh, basis))
    out = run(a2, b2, ba2, perm, 0, SPP, np.uint32(0))
    log(f"forward probe done, mean={float(out.mean()):.4f}")
    print("FWD_SCHED =", repr(run.schedules))

if which in ("d8", "d50", "all"):
    Wg, Hg, SPPg = 400, 225, 8
    basis_g = make_basis(scene.camera, Wg, Hg)
    a3, b3, ba3 = jax.device_put((arrays, bvh, basis_g))
    pix = jnp.broadcast_to(jnp.arange(Wg * Hg, dtype=jnp.int32),
                           (SPPg, Wg * Hg))
    sam = jnp.broadcast_to(jnp.arange(SPPg, dtype=jnp.int32)[:, None],
                           (SPPg, Wg * Hg))
    target = jnp.zeros((Wg * Hg, 3), jnp.float32)
    for key, depth, remat in (("d8", 8, False), ("d50", 50, True)):
        if which not in (key, "all"):
            continue
        t0 = time.perf_counter()
        psched = measure_partition_schedule(scene, Wg, Hg, depth, mode,
                                            a3, b3, ba3, pix, sam)
        log(f"{key}: psched probe {time.perf_counter()-t0:.1f}s")
        print(f"PSCHED_{key} =", repr(psched))
        t0 = time.perf_counter()
        init, step = make_train_step(scene, Wg, Hg, depth, mode,
                                     remat=remat, partition_sched=psched)
        state = init(a3)
        step_jit = jax.jit(step)
        _, loss = step_jit(state, a3, b3, ba3, pix, sam, np.uint32(0),
                           target)
        np.asarray(loss)
        log(f"{key}: train-step compile+first-exec "
            f"{time.perf_counter()-t0:.1f}s, loss={float(loss):.4f}")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, loss = step_jit(state, a3, b3, ba3, pix, sam, np.uint32(0),
                               target)
            np.asarray(loss)
            best = min(best, time.perf_counter() - t0)
        log(f"{key}: best rep {best*1e3:.1f} ms = "
            f"{Wg*Hg*SPPg/best/1e6:.3f} Mrays/s")
