"""Phase breakdown INSIDE the shade+detail half of a bounce (real TPU).

After PT_BOX cut the sweep's columns, shading is the larger half of each
bounce (tools/prof_phases.py).  This tool splits it: winner row-gathers,
hit detail (sphere uv transcendentals / box face recovery), texture
lanes (Perlin turbulence is the suspect), material lanes, and the RNG
stream hashes — measured on the final scene's real first-bounce state.

Run from the repo root: ``python -m tools.prof_shade``.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.ops import perlin
from hyper_ray_tracer_tpu.ops import rng as prng
from hyper_ray_tracer_tpu.ops.bvh import make_scan_intersector
from hyper_ray_tracer_tpu.ops.intersect import (
    gather_prim_packed,
    make_hit_detailer,
    pack_prim,
)
from hyper_ray_tracer_tpu.ops.materials import shade
from hyper_ray_tracer_tpu.ops.textures import texture_value
from hyper_ray_tracer_tpu.render import T_MIN, block_order, make_ray_colorer, \
    prepare_scene

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

    trace = make_scan_intersector(static, scene.arrays.geom)
    t_hit, prim = jax.jit(lambda: trace(
        arrays.geom, state.o, state.d, state.time, T_MIN, state.base,
        state.alive))()
    t_hit, prim = jax.block_until_ready((t_hit, prim))
    pidx = jnp.maximum(prim, 0)
    t_use = jnp.where(t_hit < 1e37, t_hit, 1.0)

    detail_fn = make_hit_detailer(static)

    def run(f):
        g = jax.jit(f)
        return timeit(lambda: np.asarray(g()))

    # winner gathers
    t_gather = run(lambda: sum(
        x.sum() for x in gather_prim_packed(
            *pack_prim(arrays.geom, jnp), pidx)[0]._asdict().values()))

    # detail
    def _detail():
        pf, _ = gather_prim_packed(*pack_prim(arrays.geom, jnp), pidx)
        det = detail_fn(pf, state.o, state.d, state.time, t_use, jnp)
        return (det.point.sum() + det.normal.sum() + det.u.sum()
                + det.v.sum())
    t_detail = run(_detail)

    # full shade (incl. textures + RNG)
    def _shade():
        pf, mat_idx = gather_prim_packed(*pack_prim(arrays.geom, jnp), pidx)
        det = detail_fn(pf, state.o, state.d, state.time, t_use, jnp)
        sc = shade(arrays, mat_idx, det, state.d, state.base, static, jnp)
        return (sc.emitted.sum() + sc.attenuation.sum()
                + sc.direction.sum())
    t_shade_full = run(_shade)

    # texture value alone (on detail outputs)
    def _tex():
        pf, mat_idx = gather_prim_packed(*pack_prim(arrays.geom, jnp), pidx)
        det = detail_fn(pf, state.o, state.d, state.time, t_use, jnp)
        tex_idx = arrays.materials.texture[mat_idx]
        return texture_value(arrays.textures, arrays.images,
                             arrays.image_wh, arrays.perlin, tex_idx,
                             det.u, det.v, det.point, static, jnp).sum()
    t_tex = run(_tex)

    # turbulence alone on [N,3] points
    pts = state.o + 0.37 * state.d
    t_turb = run(lambda: perlin.turbulence(arrays.perlin, 0.1 * pts,
                                           jnp).sum())

    # the 6 shading RNG streams alone
    def _rng():
        s = jnp.float32(0.0)
        for p in (prng.P_LAMBERT_A, prng.P_LAMBERT_B, prng.P_SPHERE_A,
                  prng.P_SPHERE_B, prng.P_SPHERE_C, prng.P_DIELECTRIC):
            s = s + prng.uniform(state.base, p).sum()
        return s
    t_rng = run(_rng)

    print(f"winner row-gathers:            {t_gather*1e3:8.1f} ms")
    print(f"+ hit detail:                  {t_detail*1e3:8.1f} ms")
    print(f"texture_value (via detail):    {t_tex*1e3:8.1f} ms"
          f"   -> textures ~ {(t_tex-t_detail)*1e3:.1f} ms")
    print(f"turbulence alone ([N,3] pts):  {t_turb*1e3:8.1f} ms")
    print(f"6 RNG streams:                 {t_rng*1e3:8.1f} ms")
    print(f"full shade (detail+tex+mats):  {t_shade_full*1e3:8.1f} ms"
          f"   -> materials ~ {(t_shade_full-t_tex)*1e3:.1f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
