"""Round-5: what does one bench rep actually pay? (VERDICT r4 task 3)

Splits the bench's timed rep (final scene, 400x225x16 spp, depth 10)
into:

  host rep      run(...) + np.asarray readback  (bench.py today)
  device rep    same dispatch, block on device only (no 1 MB tunnel
                readback, no overflow fetch)
  pipelined     the PRODUCTION per-chunk cost: K deferred chunks
                dispatched back-to-back with device-resident
                accumulation (render_image's steady state), total/K

Usage: python -m tools.prof_rep5 [scene]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.render import (
    block_order,
    make_compacting_renderer,
    prepare_scene,
)

W, H, SPP, DEPTH = 400, 225, 16, 10


def main() -> int:
    scene = build_scene(sys.argv[1] if len(sys.argv) > 1 else "final")
    arrays, bvh, mode = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    run = make_compacting_renderer(scene, W, H, DEPTH, mode)
    perm = jax.device_put(jnp.asarray(block_order(W, H)))
    arrays, bvh, basis = jax.device_put((arrays, bvh, basis))
    n_rays = W * H * SPP
    dev = jax.devices()[0]
    print(f"# {scene.name} {W}x{H}x{SPP} depth {DEPTH} on {dev}",
          flush=True)

    # Warmup (probe + scheduled compile).
    out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
    out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
    print(f"# warm, mean radiance {float(np.asarray(out).mean()):.4f}",
          flush=True)

    def mrays(t):
        return n_rays / t / 1e6

    # 1. bench-style rep: full host readback each rep.
    best = min(
        _t(lambda: np.asarray(run(arrays, bvh, basis, perm, 0, SPP,
                                  np.uint32(0))))
        for _ in range(5))
    print(f"host rep   : {best*1e3:7.1f} ms  {mrays(best):.2f} Mrays/s",
          flush=True)

    # 2. device-only rep: block on the device buffer, never ship it.
    def dev_rep():
        fin = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0),
                  defer=True)
        x = fin(to_host=False)
        jax.block_until_ready(x)

    best = min(_t(dev_rep) for _ in range(5))
    print(f"device rep : {best*1e3:7.1f} ms  {mrays(best):.2f} Mrays/s",
          flush=True)

    # 3. pipelined production chunks: K chunks, two-deep dispatch,
    # device-resident accumulator (render_image's steady state).
    K = 8
    for _ in range(2):
        acc = jnp.zeros((W * H, 3), jnp.float32)
        fins = []
        t0 = time.perf_counter()
        for k in range(K):
            fins.append(run(arrays, bvh, basis, perm, k * SPP, SPP,
                            np.uint32(0), defer=True))
            if len(fins) > 1:
                acc = acc + fins.pop(0)(to_host=False)
        acc = acc + fins.pop(0)(to_host=False)
        jax.block_until_ready(acc)
        t = (time.perf_counter() - t0) / K
    print(f"pipelined  : {t*1e3:7.1f} ms/chunk  {mrays(t):.2f} Mrays/s "
          f"(K={K}, device-resident accumulation)", flush=True)
    return 0


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())
