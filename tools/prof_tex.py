"""Round-4b: can the texture slice be class-bucketed or block-skipped?

prof_shade4 measured texture_value at +26.5 ms of shade's +33.7 per
1.54M-lane bounce on the final scene — Perlin turbulence (7 octaves x 8
corner hash-gradients per lane) and the earthmap texel gather, both
computed for EVERY lane and masked, while only ~2% of lanes hit each.

Global selection permutations measured too expensive to pay per bounce
(argsort of a 2-bit key: 27.5 ms; cumsum+scatter prefix: 30.6 ms at
1.44M lanes — either eats the entire slice).  The cheap alternative is
BLOCK sparsity: the image-block launch order clusters noise/image lanes
into a few contiguous windows, so a Pallas kernel can skip whole VPU
blocks whose mask is all-false (`pl.when(any(mask))`) — no permutation,
no dynamic shapes, and turbulence is gather-free computed-hash math so
the kernel body is pure VPU work.

Measures on the real TPU at the bench shape (final scene, 1.44M lanes):
  1. per-ttype lane fractions AND per-block occupancy at bounces 0-2;
  2. the tex slice split: turbulence-only vs texel-gather-only;
  3. dense XLA turbulence vs Pallas block-sparse turbulence.

Run from the repo root: ``python -m tools.prof_tex``.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.models.scene import TT_IMAGE, TT_NOISE
from hyper_ray_tracer_tpu.ops import perlin
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


def make_pallas_turb(keys, block_rows: int):
    """[N] block-sparse marble: skip (block_rows, 128) tiles with no
    noise lane.  Inputs padded/reshaped to [rows, 128].

    Pallas kernels may not capture traced constants; the perlin hash
    keys are baked in as Python ints (they fold to scalar literals)."""
    keys = perlin.PerlinKeys(*(np.uint32(int(k)) for k in keys))

    def kernel(m_ref, x_ref, y_ref, z_ref, out_ref):
        hit = jnp.any(m_ref[:] != 0)

        @pl.when(hit)
        def _():
            z = z_ref[:]
            turb = perlin.turbulence_xyz(keys, x_ref[:], y_ref[:], z,
                                         jnp)
            out_ref[:] = 0.5 * (1.0 + jnp.sin(z + 10.0 * turb))

        @pl.when(jnp.logical_not(hit))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

    blk = 128 * block_rows
    n_pad = -(-N // blk) * blk
    rows = n_pad // 128

    @jax.jit
    def run(mask, spx, spy, spz):
        def r(a, dt):
            return (jnp.zeros(n_pad, dt).at[:N].set(a.astype(dt))
                    .reshape(rows, 128))
        spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            grid=(rows // block_rows,),
            in_specs=[spec] * 4,
            out_specs=spec,
        )(r(mask, jnp.int8), r(spx, jnp.float32), r(spy, jnp.float32),
          r(spz, jnp.float32))
        return out.reshape(n_pad)[:N]

    return run


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
    detail_fn = make_hit_detailer(static)

    # ---- 1. class fractions + block occupancy over the first bounces --
    def class_masks(st, bounce_idx):
        geom = arrays.geom
        bb = prng.bounce_base(st.base, bounce_idx)
        t_hit, prim = trace(geom, st.o, st.d, st.time, T_MIN, bb,
                            st.alive)
        hit = (prim >= 0) & st.alive
        pidx = jnp.maximum(prim, 0)
        fpack, ipack = pack_prim_shade(arrays, static, jnp)
        _, _, sf = gather_prim_shade_packed(fpack, ipack, pidx, static)
        return hit & (sf.ttype == TT_NOISE), hit & (sf.ttype == TT_IMAGE)

    step_jit = jax.jit(colorer.bounce_step)
    cm_jit = jax.jit(class_masks)
    st = state
    for b in range(3):
        mn, mi = jax.device_get(cm_jit(st, jnp.uint32(b)))
        alive = int(jax.device_get(st.alive.sum(dtype=jnp.int32)))
        n = mn.shape[0]
        line = (f"bounce {b}: lanes {n:8d} alive {alive:8d} "
                f"noise {mn.sum():7d} image {mi.sum():7d}")
        for blk in (1024, 4096, 16384):
            occ_n = mn[: n - n % blk].reshape(-1, blk).any(1).mean()
            occ_i = mi[: n - n % blk].reshape(-1, blk).any(1).mean()
            line += f"  blk{blk}: n{100*occ_n:.0f}%/i{100*occ_i:.0f}%"
        print(line, flush=True)
        st = jax.block_until_ready(step_jit(arrays, bvh, st,
                                            jnp.uint32(b)))
    mn0, mi0 = cm_jit(state, jnp.uint32(0))

    # ---- 2. tex slice split in trace context ---------------------------
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
            pf, mat_idx, sf = gather_prim_shade_packed(fpack, ipack,
                                                       pidx, static)
            det = detail_fn(pf, o, d, time_, t_use, jnp)
            acc = t_use.sum() + det.point.sum() + det.normal.sum()
            if point == "none":
                return acc
            if point == "turb":
                sp = sf.scale[..., None] * det.point
                turb = perlin.turbulence(arrays.perlin, sp, jnp)
                marble = 0.5 * (1.0 + jnp.sin(sp[..., 2] + 10.0 * turb))
                return acc + marble.sum()
            if point == "texel":
                img_id = sf.image_id
                wh = arrays.image_wh[img_id]
                w = wh[..., 0].astype(np.float32)
                h = wh[..., 1].astype(np.float32)
                uu = jnp.clip(det.u, 0.0, 1.0)
                vv = 1.0 - jnp.clip(det.v, 0.0, 1.0)
                i = jnp.minimum((uu * w).astype(np.int32), wh[..., 0] - 1)
                j = jnp.minimum((vv * h).astype(np.int32), wh[..., 1] - 1)
                ni, ih, iw, _ = arrays.images.shape
                flat = arrays.images.reshape(ni * ih * iw, 3)
                texel = flat[(img_id * (ih * iw) + j * iw + i)]
                return acc + texel.sum()
            if point == "pl_turb":
                sp = sf.scale[..., None] * det.point
                marble = pl_turb(sf.ttype == TT_NOISE, sp[..., 0],
                                 sp[..., 1], sp[..., 2])
                return acc + marble.sum()
            tex = texture_value(arrays.textures, arrays.images,
                                arrays.image_wh, arrays.perlin, None,
                                det.u, det.v, det.point, static, jnp,
                                sf=sf)
            return acc + tex.sum()
        return jax.jit(f)

    base_t = None
    for point in ("none", "turb", "texel", "full"):
        g = cut(point)
        t = timeit(lambda: np.asarray(g(state, jnp.uint32(0))))
        extra = ("" if base_t is None
                 else f"  (delta {1e3*(t-base_t):+6.1f})")
        if point == "none":
            base_t = t
        print(f"  {point:7s} {t*1e3:8.1f} ms{extra}", flush=True)

    # ---- 3. Pallas block-sparse turbulence -----------------------------
    spx = state.o[:, 0] * 1.1  # realistic float inputs, any values work
    spy = state.o[:, 1] * 1.1
    spz = state.o[:, 2] * 1.1
    dense_t = None
    for rows in (8, 32, 128):
        pl_turb = make_pallas_turb(arrays.perlin.keys, rows)
        t = timeit(lambda: jax.block_until_ready(
            pl_turb(mn0, spx, spy, spz)))
        print(f"  pallas turb blk({rows},128) real mask: {t*1e3:7.1f} ms",
              flush=True)
        t = timeit(lambda: jax.block_until_ready(
            pl_turb(jnp.ones(N, bool), spx, spy, spz)))
        print(f"  pallas turb blk({rows},128) all-true:  {t*1e3:7.1f} ms",
              flush=True)
        if dense_t is None:
            def dense(x, y, z):
                sp = jnp.stack([x, y, z], axis=-1)
                turb = perlin.turbulence(arrays.perlin, sp, jnp)
                return 0.5 * (1.0 + jnp.sin(sp[..., 2] + 10.0 * turb))
            dense_j = jax.jit(dense)
            dense_t = timeit(lambda: jax.block_until_ready(
                dense_j(spx, spy, spz)))
            print(f"  dense XLA turbulence:              "
                  f"{dense_t*1e3:7.1f} ms", flush=True)

    # in-context: full bounce trace+gather+pallas-turb
    pl_turb = make_pallas_turb(arrays.perlin.keys, 8)
    g = cut("pl_turb")
    t = timeit(lambda: np.asarray(g(state, jnp.uint32(0))))
    print(f"  in-context pallas turb (blk 8): {t*1e3:7.1f} ms "
          f"(delta vs none {1e3*(t-base_t):+6.1f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
