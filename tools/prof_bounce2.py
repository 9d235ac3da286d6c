"""In-context ablation of the bounce step's shade half (real TPU).

prof_bounce measured: trace 50 ms actual, full bounce 108 ms — but the
shade pieces in isolation (prof_shade) sum to ~14 ms.  This tool rebuilds
the bounce step cut at successive points, WITH the trace included in every
variant (so fusion context matches the real kernel), to find where the
missing ~40 ms lives.

Findings (v5e, 1.44M-ray final scene, sync floor ~25 ms subtracted):
before the star-join — trace +52, winner gather +16.5, detail +0,
shade +43.3, merge +0; the shade cost was its four material/texture
table gathers.  After pack_prim_shade joined those tables into the
winner gather — gather +24.7 (wider rows), shade +31.4, one bounce
134 → 126 ms, bench 2.01 → 2.26 Mrays/s.

Run from the repo root: ``python -m tools.prof_bounce2``.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.ops import rng as prng
from hyper_ray_tracer_tpu.ops.bvh import make_scan_intersector
from hyper_ray_tracer_tpu.ops.intersect import (
    gather_prim_shade_packed,
    make_hit_detailer,
    pack_prim_shade,
)
from hyper_ray_tracer_tpu.ops.materials import shade
from hyper_ray_tracer_tpu.render import (
    T_MIN,
    block_order,
    make_ray_colorer,
    prepare_scene,
)

W, H, SPP, DEPTH = 400, 225, 16, 10
N = W * H * SPP


def timeit(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scene = build_scene("final")
    print("device:", jax.devices()[0], flush=True)
    arrays, bvh, mode = prepare_scene(scene)
    static = scene.static
    basis = make_basis(scene.camera, W, H)
    colorer = make_ray_colorer(scene, W, H, DEPTH, mode,
                               differentiable=False)
    pix = jnp.asarray(np.tile(block_order(W, H), SPP))
    sam = jnp.asarray(np.repeat(np.arange(SPP, dtype=np.int32), W * H))
    arrays, bvh, basis = jax.device_put((arrays, bvh, basis))
    state = jax.block_until_ready(
        jax.jit(colorer.init_state)(basis, pix, sam, np.uint32(0)))

    one = jnp.float32(1.0) + state.time[0] * 0
    t_sync = timeit(lambda: np.asarray(one * 1.0), reps=5)
    print(f"sync floor: {t_sync*1e3:.1f} ms", flush=True)

    trace = make_scan_intersector(static, scene.arrays.geom)
    detail_fn = make_hit_detailer(static)
    bg = jnp.asarray(scene.background, jnp.float32) \
        if scene.background is not None else None

    def cut(point):
        """Bounce-step variant stopping at `point`."""
        def f(st, bounce_idx):
            geom = arrays.geom
            o, d, time_, base = st.o, st.d, st.time, st.base
            alive, throughput, radiance = (
                st.alive, st.throughput, st.radiance)
            bb = prng.bounce_base(base, bounce_idx)
            t_hit, prim = trace(geom, o, d, time_, T_MIN, bb, alive)
            hit = prim >= 0
            miss = alive & ~hit
            radiance = radiance + jnp.where(miss[:, None],
                                            throughput * bg, 0.0)
            pidx = jnp.maximum(prim, 0)
            t_use = jnp.where(hit, t_hit, 1.0)
            if point == "trace":
                return t_use.sum() + radiance.sum()
            fpack, ipack = pack_prim_shade(arrays, static, jnp)
            pf, mat_idx, sfields = gather_prim_shade_packed(fpack, ipack,
                                                            pidx, static)
            if point == "gather":
                return (t_use.sum() + radiance.sum()
                        + sum(x.sum() for x in pf._asdict().values()
                              if x is not None)
                        + mat_idx.sum()
                        + sum(x.sum(dtype=jnp.float32)
                              for x in sfields._asdict().values()
                              if x is not None))
            det = detail_fn(pf, o, d, time_, t_use, jnp)
            if point == "detail":
                return (radiance.sum() + det.point.sum() + det.normal.sum()
                        + det.u.sum() + det.v.sum()
                        + det.front_face.sum(dtype=jnp.float32))
            sc = shade(arrays, mat_idx, det, d, bb, static, jnp, sf=sfields)
            if point == "shade":
                return (radiance.sum() + det.point.sum() + sc.emitted.sum()
                        + sc.attenuation.sum() + sc.direction.sum()
                        + sc.did_scatter.sum(dtype=jnp.float32))
            contrib = alive & hit
            radiance = radiance + jnp.where(contrib[:, None],
                                            throughput * sc.emitted, 0.0)
            alive = contrib & sc.did_scatter
            throughput = jnp.where(alive[:, None],
                                   throughput * sc.attenuation, throughput)
            o = jnp.where(alive[:, None], det.point, o)
            d = jnp.where(alive[:, None], sc.direction, d)
            return (o.sum() + d.sum() + radiance.sum() + throughput.sum()
                    + alive.sum(dtype=jnp.float32))
        return jax.jit(f)

    prev = 0.0
    for point in ("trace", "gather", "detail", "shade", "full"):
        g = cut(point)
        t = timeit(lambda: np.asarray(g(state, jnp.uint32(0))))
        print(f"{point:8s} {t*1e3:8.1f} ms   (delta {(t-prev)*1e3:+7.1f})",
              flush=True)
        prev = t
    return 0


if __name__ == "__main__":
    sys.exit(main())
