"""Pallas (Mosaic) kernel for the dense sphere sweep.

The production intersector is the XLA tiled sweep in ``ops/bvh.py``; the
roofline analysis in docs/DESIGN.md argues it is VPU-epilogue-bound, so a
hand-written kernel should land at roughly the same throughput.  This
module exists to (a) validate that analysis with a real Mosaic kernel and
(b) own the fused memory behaviour explicitly: primitives stay resident in
VMEM across the whole sweep, the [ray-block, prim-tile] hit matrix never
leaves registers/VMEM, and the only HBM traffic is the ray block in and
(t_best, best) out.

Scope: sphere-only scenes without media/transforms — which covers the
reference's flagship ``random`` scene (486 spheres incl. motion) and the
two-sphere scenes; mixed scenes use the XLA path.  Static spheres are
stored with p1 == p0.

In-kernel layout: rays are sublanes ([RB, 1] columns), primitives are
lanes ([1, PT] rows); every pair quantity is a rank-2 [RB, PT] broadcast,
reduced over lanes into the running best.  Closest-hit semantics and
lowest-index tie-breaks match ``scan_all`` exactly (same t_max-staleness
within a tile, strict < across tiles).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import BIG

RB = 512  # rays per grid step (sublane dimension)
PT = 128  # primitives per tile (lane dimension)


def _kernel(n_prims, n_tiles, t_min,
            ox, oy, oz, dx, dy, dz, tm, act,
            c0x, c0y, c0z, dpx, dpy, dpz, rad, tt0, idt,
            tbest_ref, best_ref):
    from jax.experimental import pallas as pl

    o_x, o_y, o_z = ox[:], oy[:], oz[:]  # [RB, 1]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    t_m = tm[:]
    active = act[:] != 0

    a = d_x * d_x + d_y * d_y + d_z * d_z  # [RB, 1]
    inv_a = 1.0 / a

    t_best0 = jnp.where(active, jnp.float32(BIG), jnp.float32(-BIG))
    best0 = jnp.full(o_x.shape, -1, jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PT), 1)

    def tile_body(i, carry):
        t_best, best = carry
        sl = pl.ds(i * PT, PT)
        cx0 = c0x[0, sl][None, :]  # [1, PT]
        cy0 = c0y[0, sl][None, :]
        cz0 = c0z[0, sl][None, :]
        px = dpx[0, sl][None, :]
        py = dpy[0, sl][None, :]
        pz = dpz[0, sl][None, :]
        r = rad[0, sl][None, :]
        t0 = tt0[0, sl][None, :]
        it = idt[0, sl][None, :]

        f = (t_m - t0) * it  # [RB, PT] (moving_sphere.rs:53-57)
        cx = cx0 + f * px
        cy = cy0 + f * py
        cz = cz0 + f * pz
        ocx = o_x - cx
        ocy = o_y - cy
        ocz = o_z - cz
        half_b = ocx * d_x + ocy * d_y + ocz * d_z
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = half_b * half_b - a * c
        exists = disc >= 0.0
        sq = jnp.sqrt(jnp.where(exists, jnp.maximum(disc, 1e-30), 1.0))
        t_near = (-half_b - sq) * inv_a
        t_far = (-half_b + sq) * inv_a
        ok1 = exists & (t_near >= t_min) & (t_near <= t_best)
        ok2 = exists & (t_far >= t_min) & (t_far <= t_best)
        t = jnp.where(ok1, t_near, jnp.where(ok2, t_far, BIG))
        # Mask padding primitives (zeroed fields alias a radius-0 sphere
        # at the origin).
        pid = i * PT + lane
        t = jnp.where(pid < n_prims, t, BIG)

        tt = jnp.min(t, axis=1, keepdims=True)  # [RB, 1]
        # Lowest-index tie-break: min over lane ids at the minimum.
        jj = jnp.min(jnp.where(t == tt, pid, n_prims), axis=1,
                     keepdims=True)
        upd = tt < t_best
        return (jnp.where(upd, tt, t_best),
                jnp.where(upd, jj, best))

    t_best, best = jax.lax.fori_loop(0, n_tiles, tile_body,
                                     (t_best0, best0))
    tbest_ref[:] = jnp.where(active, t_best, jnp.float32(BIG))
    best_ref[:] = best


def make_pallas_sphere_sweep(n_prims: int, t_min: float = 1.0e-3,
                             interpret: bool = False):
    """Build sweep(p0, p1, time0, time1, radius, o, d, time, active)
    -> (t_best [N], best [N]).

    ``p0``/``p1`` are [P,3]; ray arrays are [N,...]; N is padded to a
    multiple of RB internally.  ``interpret=True`` runs the kernel in the
    Pallas interpreter (CPU tests).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = -(-n_prims // PT)
    p_pad = n_tiles * PT
    kernel = partial(_kernel, n_prims, n_tiles, np.float32(t_min))

    prim_spec = pl.BlockSpec((1, p_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((RB, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def sweep(p0, p1, time0, time1, radius, o, d, time, active):
        n = o.shape[0]
        nb = -(-n // RB)
        n_rpad = nb * RB

        def pad_p(x):
            return jnp.pad(x, (0, p_pad - n_prims)).reshape(1, p_pad)

        def pad_r(x, fill=0.0):
            return jnp.pad(x, (0, n_rpad - n),
                           constant_values=fill).reshape(n_rpad, 1)

        dp = p1 - p0
        idt = 1.0 / (time1 - time0)
        prim_args = [pad_p(v) for v in
                     (p0[:, 0], p0[:, 1], p0[:, 2],
                      dp[:, 0], dp[:, 1], dp[:, 2],
                      radius, time0, idt)]
        ray_args = [pad_r(v) for v in
                    (o[:, 0], o[:, 1], o[:, 2],
                     d[:, 0], d[:, 1], d[:, 2], time)]
        ray_args.append(pad_r(active.astype(jnp.int32), 0).astype(jnp.int32))

        t_best, best = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[ray_spec] * 8 + [prim_spec] * 9,
            out_specs=(ray_spec, ray_spec),
            out_shape=(
                jax.ShapeDtypeStruct((n_rpad, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_rpad, 1), jnp.int32),
            ),
            interpret=interpret,
        )(*ray_args, *prim_args)
        return t_best[:n, 0], best[:n, 0]

    return sweep
