"""Profile intersector variants on the real TPU: cluster vs sweep, per
phase, at primary-bounce and secondary-bounce ray distributions."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.models.clusters import build_clusters
from hyper_ray_tracer_tpu.ops.bvh import make_scan_intersector
from hyper_ray_tracer_tpu.ops.cluster_sweep import make_cluster_intersector
from hyper_ray_tracer_tpu.render import (
    T_MIN,
    block_order,
    make_ray_colorer,
    prepare_scene,
)

W, H, SPP = 400, 225, 16
N = W * H * SPP


def bench(fn, *args, reps=3):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scene = build_scene("final")
    print("device:", jax.devices()[0], flush=True)

    # --- build both geometries
    arrays_c, bvh, _ = prepare_scene(scene, "cluster")
    arrays_s, _, _ = prepare_scene(scene, "sweep")
    _, layout = build_clusters(scene.arrays.geom, scene.static.n_prims)
    trace_c = make_cluster_intersector(scene.static, layout)
    trace_s = make_scan_intersector(scene.static, scene.arrays.geom)

    # --- primary rays, block order
    colorer = make_ray_colorer(scene, W, H, 10, "cluster",
                               differentiable=False)
    basis = make_basis(scene.camera, W, H)
    pix = jnp.asarray(np.tile(block_order(W, H), SPP))
    sam = jnp.asarray(np.repeat(np.arange(SPP, dtype=np.int32), W * H))
    arrays_c, arrays_s, bvh, basis = jax.device_put(
        (arrays_c, arrays_s, bvh, basis))
    state = jax.jit(colorer.init_state)(basis, pix, sam, np.uint32(0))
    state = jax.block_until_ready(state)

    # secondary-like rays: scatter directions randomly, origins = hit pts
    r = np.random.default_rng(0)
    d2 = jnp.asarray(r.normal(size=(N, 3)).astype(np.float32))
    o2 = jnp.asarray((r.uniform(-300, 600, size=(N, 3))).astype(np.float32))
    alive2 = jnp.asarray(r.uniform(size=N) < 0.5)

    tc = jax.jit(lambda o, d, t, b, a: trace_c(
        arrays_c.geom, o, d, t, T_MIN, b, a))
    ts = jax.jit(lambda o, d, t, b, a: trace_s(
        arrays_s.geom, o, d, t, T_MIN, b, a))

    for label, o, d, al in [
        ("primary ", state.o, state.d, state.alive),
        ("secondary", o2, d2, alive2),
    ]:
        t1 = bench(lambda: tc(o, d, state.time, state.base, al)[0].sum())
        t2 = bench(lambda: ts(o, d, state.time, state.base, al)[0].sum())
        print(f"{label}: cluster {t1*1e3:7.1f} ms   sweep {t2*1e3:7.1f} ms",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
