"""Is the cold-start whale per-PROGRAM or per-SESSION?

Compiles and first-executes a sequence of medium-size scan programs with
the persistent cache disabled, timing local compile vs first execution
separately.  If the first program's first execution dominates and later
ones are fast, the axon remote-compile path has a per-session spin-up
and bench.py should warm it with one small program, not shrink its
program census.

Usage: HRT_NO_COMPILE_CACHE=1 python -m tools.prof_cold2
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
    make_ray_colorer,
    prepare_scene,
)

W, H, SPP, DEPTH = 400, 225, 16, 10

scene = build_scene("final")
arrays, bvh, mode = prepare_scene(scene)
basis = make_basis(scene.camera, W, H)
colorer = make_ray_colorer(scene, W, H, DEPTH, mode)
perm = jnp.asarray(block_order(W, H))
arrays, bvh, basis = jax.device_put((arrays, bvh, basis))
log("setup done")

state = jax.jit(colorer.init_state)(
    basis, jnp.tile(perm, SPP),
    jnp.repeat(jnp.arange(SPP, dtype=jnp.int32), perm.shape[0]),
    jnp.uint32(0))
jax.block_until_ready(state)
log("init_state (small program) compiled + ran")

scan = jax.jit(colorer.bounce_scan, static_argnums=(4,))

# Three DIFFERENT programs: same body, different static bounce counts.
for nb in (1, 2, 3):
    t0 = time.perf_counter()
    lowered = scan.lower(arrays, bvh, state, jnp.uint32(0), nb)
    compiled = lowered.compile()
    t1 = time.perf_counter()
    out = compiled(arrays, bvh, state, jnp.uint32(0))
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    log(f"scan nb={nb}: compile {t1-t0:.1f}s, first-exec {t2-t1:.1f}s")

# Same program at a different LANE count (shape change, same graph).
state2 = jax.jit(colorer.init_state)(
    basis, perm, jnp.zeros(perm.shape[0], jnp.int32), jnp.uint32(0))
t0 = time.perf_counter()
out = scan(arrays, bvh, state2, jnp.uint32(0), 1)
jax.block_until_ready(out)
log(f"scan nb=1 at 90k lanes: compile+first-exec {time.perf_counter()-t0:.1f}s")
