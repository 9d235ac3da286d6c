"""1M-prim secondary-ray diagnosis (VERDICT r4 task 4).

The crossover table's 'secondary' column traces UNIFORM random
origins/directions raw — no coherence sort (real renders sort survivors
at every compaction).  Measure, at K=1M on the cluster intersector:

  raw        the table's secondary number (baseline ~2,243 ms)
  sorted     same rays pre-ordered by the coherence key (what the
             compacted renderer's wavefront actually looks like)
  camera     coherent block-order camera rays (baseline ~87 ms)

plus tile-size and visit-pairing variants if patched in.

Usage: python -m tools.prof_sec1m [K]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.models.clusters import build_clusters
from hyper_ray_tracer_tpu.models.scene import CameraConfig, SceneBuilder
from hyper_ray_tracer_tpu.ops.cluster_sweep import (
    make_cluster_intersector,
    make_coherence_key,
)
from hyper_ray_tracer_tpu.render import T_MIN, block_order, make_ray_colorer

W, H = 400, 225
N = W * H


def make_big_scene(K: int, seed: int = 0):
    b = SceneBuilder()
    mat = b.lambertian(b.solid((0.7, 0.4, 0.3)))
    r = np.random.default_rng(seed)
    half = 120.0 * (K / 3400.0) ** (1.0 / 3.0)
    centers = r.uniform(-half, half, size=(K, 3))
    radii = r.uniform(1.5, 4.0, size=K)
    b.spheres(centers, radii, mat)
    cam = CameraConfig(look_from=(0.0, 0.0, -3.2 * half),
                      look_at=(0.0, 0.0, 0.0), fov=40.0, aperture=0.0,
                      focus_dist=10.0)
    return b.finalize(cam, background=(0.7, 0.8, 1.0), name=f"synth{K}"), half


def bench(fn, *args, reps=3):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    scene, half = make_big_scene(K)
    basis = make_basis(scene.camera, W, H)
    geom, layout = build_clusters(scene.arrays.geom, scene.static.n_prims)
    geom = jax.device_put(geom)
    tr = make_cluster_intersector(scene.static, layout)
    key_fn = make_coherence_key(layout)
    # Camera rows use the production camera variant (union path);
    # secondary rows the binned one (cluster_sweep trace notes).
    trace = jax.jit(lambda o, d, t, b, a, sec=True: tr(
        geom, o, d, t, T_MIN, b, a, secondary=sec)[0].sum())

    colorer = make_ray_colorer(scene, W, H, 2, "sweep",
                               differentiable=False)
    pix = jnp.asarray(block_order(W, H))
    sam = jnp.zeros(N, jnp.int32)
    st = jax.block_until_ready(
        jax.jit(colorer.init_state)(basis, pix, sam, np.uint32(0)))

    rng = np.random.default_rng(1)
    o2 = jnp.asarray(rng.uniform(-half, half, (N, 3)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))

    t_cam = bench(trace, st.o, st.d, st.time, st.base, st.alive, False)
    print(f"K={K} camera     {t_cam*1e3:9.1f} ms", flush=True)
    t_raw = bench(trace, o2, d2, st.time, st.base, st.alive)
    print(f"K={K} sec raw    {t_raw*1e3:9.1f} ms", flush=True)

    order = jax.jit(lambda o, d: jnp.argsort(key_fn(o, d)))(o2, d2)
    o3, d3 = o2[order], d2[order]
    t_srt = bench(trace, o3, d3, st.time, st.base, st.alive)
    print(f"K={K} sec sorted {t_srt*1e3:9.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
