"""Measure the intersector crossover on synthetic large scenes.

VERDICT round 1 flagged the auto-intersector threshold (then
``AUTO_BVH_MIN_PRIMS = 100_000``) as an unmeasured guess.  This tool builds
K-sphere scenes (K = 3.4k-class .. 300k), runs one full-wavefront trace per
intersector at two ray distributions (coherent camera rays in block order;
incoherent secondary-style rays), and prints the table that sets the auto
policy — the measured result lives above ``AUTO_CLUSTER_MIN_PRIMS`` in
``render.py`` (TPU v5e, 2026-08-17): BVH traversal never wins; the cluster
sweep overtakes the plain sweep at ~30k prims on both distributions.

Run on the real TPU: ``python -m tools.bench_crossover``.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.models.scene import CameraConfig, SceneBuilder
from hyper_ray_tracer_tpu.render import (
    T_MIN,
    block_order,
    make_ray_colorer,
    prepare_scene,
)

W, H = 400, 225
N = W * H  # 90k rays per trace

SIZES = [3_400, 30_000, 100_000, 300_000, 1_000_000]


def bvh_ray_div(K: int) -> int:
    """BVH traversal at 90k rays already measured 5.1 s on the 3.4k-prim
    final scene; run it with fewer rays and scale (cost is linear in rays).
    The divisor grows with K so a single dispatch stays well under the
    tunneled device's ~30 s kill threshold."""
    return 8 if K <= 30_000 else (32 if K <= 300_000 else 64)


def sweep_ray_div(K: int) -> int:
    """The dense sweep is linear in rays too; at 1M prims a full 90k-ray
    trace is ~11 s — scale it the same way the BVH rows are scaled."""
    return 1 if K <= 300_000 else 8


def make_big_scene(K: int, seed: int = 0):
    b = SceneBuilder()
    mat = b.lambertian(b.solid((0.7, 0.4, 0.3)))
    r = np.random.default_rng(seed)
    # Box of spheres with ~constant covered volume fraction.
    half = 120.0 * (K / 3400.0) ** (1.0 / 3.0)
    centers = r.uniform(-half, half, size=(K, 3))
    radii = r.uniform(1.5, 4.0, size=K)
    for c, rad in zip(centers, radii):
        b.sphere(c, float(rad), mat)
    cam = CameraConfig(look_from=(0.0, 0.0, -3.2 * half),
                       look_at=(0.0, 0.0, 0.0), fov=40.0, aperture=0.0,
                       focus_dist=10.0)
    return b.finalize(cam, background=(0.7, 0.8, 1.0), name=f"synth{K}")


def bench(fn, *args, reps=3):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(1)
    rows = []
    for K in SIZES:
        scene = make_big_scene(K)
        basis = make_basis(scene.camera, W, H)

        # Camera wavefront in block order (coherent tiles).
        colorer0 = make_ray_colorer(scene, W, H, 2, "sweep",
                                    differentiable=False)
        pix = jnp.asarray(block_order(W, H))
        sam = jnp.zeros(N, jnp.int32)
        state = jax.block_until_ready(
            jax.jit(colorer0.init_state)(basis, pix, sam, np.uint32(0)))
        half = 120.0 * (K / 3400.0) ** (1.0 / 3.0)
        o2 = jnp.asarray(rng.uniform(-half, half, (N, 3)).astype(np.float32))
        d2 = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))

        # Coherence-SORTED secondary rays: what the compacted renderer's
        # wavefront actually looks like (every milestone re-orders
        # survivors by make_coherence_key).  The raw column is the
        # no-sort worst case; the sorted one is the operative number for
        # the cluster intersector (round 5, tools/prof_sec1m.py: raw
        # 2,224 ms -> sorted 523 ms at K=1M).
        res = {}
        sort_order = None
        for mode in ["sweep", "cluster", "bvh"]:
            arrays, bvh, _ = prepare_scene(scene, mode)
            arrays, bvh = jax.device_put((arrays, bvh))
            if mode == "cluster":
                from hyper_ray_tracer_tpu.models.clusters import (
                    build_clusters,
                )
                from hyper_ray_tracer_tpu.ops.cluster_sweep import (
                    make_cluster_intersector,
                )

                _, layout = build_clusters(scene.arrays.geom,
                                           scene.static.n_prims)
                tr = make_cluster_intersector(scene.static, layout)
                # secondary=False/True: production camera bounces take
                # the union path, secondary bounces the binned one
                # (cluster_sweep trace notes) — measure each column on
                # the variant the renderer actually runs for it.
                trace = jax.jit(lambda o, d, t, b, a, sec=False,
                                _g=arrays.geom, _t=tr:
                                _t(_g, o, d, t, T_MIN, b, a,
                                   secondary=sec)[0].sum())
                from hyper_ray_tracer_tpu.ops.cluster_sweep import (
                    make_coherence_key,
                )

                key_fn = make_coherence_key(layout)
                sort_order = np.asarray(
                    jax.jit(lambda o, d: jnp.argsort(key_fn(o, d)))(
                        o2, d2))
            else:
                from hyper_ray_tracer_tpu.ops.bvh import make_intersector

                tr = make_intersector(
                    scene.static, bvh_mode=(mode == "bvh"),
                    host_geom=scene.arrays.geom if mode == "sweep"
                    else None)
                trace = jax.jit(lambda o, d, t, b, a, _g=arrays.geom,
                                _b=bvh, _t=tr: _t(_g, _b, o, d, t, T_MIN,
                                                  b, a)[0].sum())
            div = (bvh_ray_div(K) if mode == "bvh"
                   else sweep_ray_div(K) if mode == "sweep" else 1)
            sl = slice(0, N // div)
            try:
                t_cam = bench(trace, state.o[sl], state.d[sl],
                              state.time[sl], state.base[sl],
                              state.alive[sl]) * div
                sec = (True,) if mode == "cluster" else ()
                t_sec = bench(trace, o2[sl], d2[sl], state.time[sl],
                              state.base[sl], state.alive[sl],
                              *sec) * div
                t_srt = float("nan")
                if mode == "cluster":
                    o3 = o2[jnp.asarray(sort_order)]
                    d3 = d2[jnp.asarray(sort_order)]
                    t_srt = bench(trace, o3[sl], d3[sl], state.time[sl],
                                  state.base[sl], state.alive[sl],
                                  *sec) * div
            except Exception as e:  # OOM / compile limits at huge K
                print(f"  {mode} failed at K={K}: {type(e).__name__}",
                      file=sys.stderr)
                t_cam = t_sec = t_srt = float("nan")
            res[mode] = (t_cam, t_sec, t_srt)
            print(f"K={K:>7} {mode:7s} camera {t_cam*1e3:9.1f} ms   "
                  f"secondary {t_sec*1e3:9.1f} ms"
                  + (f"   sorted {t_srt*1e3:9.1f} ms"
                     if mode == "cluster" else "")
                  + ("   (x%d ray scaling)" % div if div > 1 else ""),
                  flush=True)
        rows.append((K, res))

    print("\n| K | sweep cam | cluster cam | bvh cam | sweep 2nd | "
          "cluster 2nd raw | cluster 2nd sorted | bvh 2nd |")
    for K, res in rows:
        c = {m: res[m] for m in ["sweep", "cluster", "bvh"]}
        print(f"| {K} | {c['sweep'][0]*1e3:.0f} | {c['cluster'][0]*1e3:.0f}"
              f" | {c['bvh'][0]*1e3:.0f} | {c['sweep'][1]*1e3:.0f} |"
              f" {c['cluster'][1]*1e3:.0f} | {c['cluster'][2]*1e3:.0f} |"
              f" {c['bvh'][1]*1e3:.0f} |  (ms / 90k rays)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
