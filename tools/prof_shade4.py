"""Round-4 shade-slice ablation IN trace context (real TPU).

prof_phases4 put shade at +43 ms per 1.54M-lane bounce (the largest
scan-side slice after the drop-log rewrite).  This cuts INSIDE shade,
with the trace + winner gather included in every variant so fusion
context matches the real kernel:

  none        trace + gather only
  tex         + texture_value (checker sines, Perlin turbulence, texels)
  rng         + the 6 uniform draws
  lamb        + lambertian sampling (unit vector + near-zero)
  sphere      + in-unit-sphere sampling (cbrt + trig)
  metal       + metal reflect/fuzz/absorb
  diel        + dielectric refract/Schlick
  full        the real shade

Run from the repo root: ``python -m tools.prof_shade4``.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.ops import math as M
from hyper_ray_tracer_tpu.ops import rng as prng
from hyper_ray_tracer_tpu.ops.bvh import make_scan_intersector
from hyper_ray_tracer_tpu.ops.intersect import (
    gather_prim_shade_packed,
    make_hit_detailer,
    pack_prim_shade,
)
from hyper_ray_tracer_tpu.ops.textures import texture_value
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

    def cut(point):
        def f(st, bounce_idx):
            geom = arrays.geom
            o, d, time_, base = st.o, st.d, st.time, st.base
            bb = prng.bounce_base(base, bounce_idx)
            t_hit, prim = trace(geom, o, d, time_, T_MIN, bb, st.alive)
            hit = prim >= 0
            pidx = jnp.maximum(prim, 0)
            t_use = jnp.where(hit, t_hit, 1.0)
            fpack, ipack = pack_prim_shade(arrays, static, jnp)
            pf, mat_idx, sfields = gather_prim_shade_packed(fpack, ipack,
                                                            pidx, static)
            det = detail_fn(pf, o, d, time_, t_use, jnp)
            acc = t_use.sum() + det.point.sum() + det.normal.sum()
            if point == "none":
                return acc
            if point in ("tex", "full"):
                tex = texture_value(arrays.textures, arrays.images,
                                    arrays.image_wh, arrays.perlin, None,
                                    det.u, det.v, det.point, static, jnp,
                                    sf=sfields)
                acc = acc + tex.sum()
                if point == "tex":
                    return acc
            if point in ("rng", "lamb", "sphere", "metal", "diel"):
                u1 = prng.uniform(bb, prng.P_LAMBERT_A)
                u2 = prng.uniform(bb, prng.P_LAMBERT_B)
                s1 = prng.uniform(bb, prng.P_SPHERE_A)
                s2 = prng.uniform(bb, prng.P_SPHERE_B)
                s3 = prng.uniform(bb, prng.P_SPHERE_C)
                ud = prng.uniform(bb, prng.P_DIELECTRIC)
                acc = acc + (u1 + u2 + s1 + s2 + s3 + ud).sum()
                if point == "rng":
                    return acc
            if point in ("lamb",):
                sdir = det.normal + M.unit_vector_from_uniforms(u1, u2,
                                                                jnp)
                sdir = jnp.where(M.near_zero(sdir, jnp), det.normal, sdir)
                return acc + sdir.sum()
            if point in ("sphere",):
                in_s = M.in_unit_sphere_from_uniforms(s1, s2, s3, jnp)
                return acc + in_s.sum()
            if point in ("metal",):
                in_s = M.in_unit_sphere_from_uniforms(s1, s2, s3, jnp)
                refl = M.reflect(M.normalize(d, jnp), det.normal)
                sdir = refl + sfields.fuzz[..., None] * in_s
                ok = (sdir * det.normal).sum(-1) > 0.0
                return acc + sdir.sum() + ok.sum(dtype=jnp.float32)
            if point in ("diel",):
                ior = sfields.ior
                ratio = jnp.where(det.front_face, 1.0 / ior, ior)
                unit_d = M.normalize(d, jnp)
                cos_t = jnp.minimum((-unit_d * det.normal).sum(-1), 1.0)
                sin2 = jnp.maximum(0.0, 1.0 - cos_t * cos_t)
                cannot = (ratio * ratio * sin2) > 1.0
                use_r = cannot | (M.reflectance(cos_t, ratio) > ud)
                refl = M.reflect(unit_d, det.normal)
                refr = M.refract(unit_d, det.normal, ratio[..., None],
                                 jnp)
                sdir = jnp.where(use_r[..., None], refl, refr)
                return acc + sdir.sum()
            # full shade
            from hyper_ray_tracer_tpu.ops.materials import shade
            sc = shade(arrays, mat_idx, det, d, bb, static, jnp,
                       sf=sfields)
            return (acc + sc.emitted.sum() + sc.attenuation.sum()
                    + sc.direction.sum()
                    + sc.did_scatter.sum(dtype=jnp.float32))
        return jax.jit(f)

    base_t = None
    for point in ("none", "tex", "rng", "lamb", "sphere", "metal",
                  "diel", "full"):
        g = cut(point)
        t = timeit(lambda: np.asarray(g(state, jnp.uint32(0))))
        extra = "" if base_t is None else f"  (delta vs none {1e3*(t-base_t):+6.1f})"
        if point == "none":
            base_t = t
        print(f"  {point:7s} {t*1e3:8.1f} ms{extra}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
