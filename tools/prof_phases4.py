"""Round-4 phase budget of the flagship forward pass (real TPU).

prof_sched gives per-SEGMENT deltas of the scheduled partitioned descent
(bounce 0+1 = ~48% of the 559 ms pass at the bench shape); this tool
splits each segment IN CONTEXT into its phases:

    trace (partitioned sweep, rows)   — ray/primitive-tile fold
    + winner row gather (pack_prim_shade star-join)
    + detail + shade (textures, Perlin, RNG, scatter math)
    + state merge                      = the full bounce_step
    compaction (category cumsums + permutation scatter + row gathers)

Each variant is jitted separately on the REAL input state of that segment
(materialised by replaying the actual schedule prefix), so shapes, rows
and bucket layouts match what the bench runs.  Compile-time fusion
context differs slightly from the fused chain (same caveat as
prof_bounce2); deltas are still the right magnitudes.

Run from the repo root: ``python -m tools.prof_phases4 [seg ...]``.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.ops import partition as P
from hyper_ray_tracer_tpu.render import (
    block_order,
    compact_wavefront_part,
    make_ray_colorer,
    prepare_scene,
    schedule_from_cat_counts,
    schedule_segments,
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
    basis = make_basis(scene.camera, W, H)
    colorer = make_ray_colorer(scene, W, H, DEPTH, mode,
                               differentiable=False)
    pg = colorer.part_groups

    def _compact(state, slots, buckets, dropb, hb):
        gs = pg if len(buckets) > 1 else ()
        return compact_wavefront_part(state, slots, buckets, dropb,
                                      gs, hole_base=hb)

    compact_jit = jax.jit(_compact, static_argnums=(2, 3, 4))
    id_init = jax.jit(
        lambda basis, perm, seed: colorer.init_state(
            basis,
            jnp.tile(perm, SPP),
            jnp.repeat(jnp.arange(SPP, dtype=jnp.int32), perm.shape[0]),
            seed,
        ))

    perm = jnp.asarray(block_order(W, H))
    arrays, bvh, basis, perm = jax.device_put((arrays, bvh, basis, perm))
    t0 = time.perf_counter()
    np.asarray(jnp.float32(1.0) + perm[0] * 0)
    print(f"warmup transfer: {time.perf_counter()-t0:.1f} s", flush=True)

    # Probe -> the real schedule.
    st0 = id_init(basis, perm, jnp.uint32(0))

    def counted(arrays, bvh, state):
        pre = colorer.cat_counts(state)
        st, counts = colorer.bounce_scan_counted_cats(
            arrays, bvh, state, jnp.uint32(0), DEPTH)
        return st, pre, counts

    _, pre_c, cat_c = jax.jit(counted)(arrays, bvh, st0)
    pre, entries = schedule_from_cat_counts(
        np.asarray(pre_c), np.asarray(cat_c)[:-1], N, pg,
        scene.static.n_prims)
    segs = list(schedule_segments(entries, DEPTH))
    print("pre:", pre, flush=True)

    one = jnp.float32(1.0)
    t_sync = timeit(lambda: np.asarray(one * 1.0), reps=5)
    print(f"sync floor: {t_sync*1e3:6.1f} ms", flush=True)

    scan_jit = jax.jit(colorer.bounce_scan, static_argnums=(4,))
    scanrows_jit = jax.jit(colorer.bounce_scan_rows, static_argnums=(4, 5))

    def seg_input(k):
        """Materialise (state, slots, acc, rows) at the input of segs[k]
        by replaying the schedule prefix."""
        state = id_init(basis, perm, jnp.uint32(0))
        slots = jnp.arange(N, dtype=jnp.int32)
        rows = None
        hb = N
        if pre is not None:
            state, slots, _, _ = compact_jit(state, slots,
                                             pre[0], pre[1], hb)
            hb += sum(pre[0]) + pre[1]
            rows = P.group_rows(pg, pre[0])
        for b0, nb, entry in segs[:k]:
            if rows is not None:
                state = scanrows_jit(arrays, bvh, state, jnp.uint32(b0),
                                     nb, rows)
            else:
                state = scan_jit(arrays, bvh, state, jnp.uint32(b0), nb)
            if entry is not None:
                buckets, dropb = entry
                state, slots, _, _ = compact_jit(state, slots,
                                                 buckets, dropb, hb)
                hb += sum(buckets) + dropb
                rows = (P.group_rows(pg, buckets)
                        if len(buckets) > 1 else None)
        return jax.block_until_ready((state, slots, hb)), rows

    # --- phase ablation of one segment -------------------------------
    from hyper_ray_tracer_tpu.ops import rng as prng
    from hyper_ray_tracer_tpu.ops.bvh import make_scan_intersector
    from hyper_ray_tracer_tpu.ops.intersect import (
        gather_prim_shade_packed,
        make_hit_detailer,
        pack_prim_shade,
    )
    from hyper_ray_tracer_tpu.ops.materials import shade
    from hyper_ray_tracer_tpu.render import T_MIN

    static = scene.static
    trace = make_scan_intersector(static, scene.arrays.geom,
                                  part_groups=pg)
    detail_fn = make_hit_detailer(static)
    bg = jnp.asarray(scene.background, jnp.float32)

    def cut(point, rows):
        def f(st, bounce_idx):
            geom = arrays.geom
            o, d, time_, base = st.o, st.d, st.time, st.base
            alive, throughput, radiance = (
                st.alive, st.throughput, st.radiance)
            bb = prng.bounce_base(base, bounce_idx)
            if point == "nothing":
                return bb.sum(dtype=jnp.float32) + o.sum()
            t_hit, prim = trace(geom, o, d, time_, T_MIN, bb, alive,
                                rows)
            hit = prim >= 0
            miss = alive & ~hit
            radiance = radiance + jnp.where(miss[:, None],
                                            throughput * bg, 0.0)
            pidx = jnp.maximum(prim, 0)
            t_use = jnp.where(hit, t_hit, 1.0)
            if point == "trace":
                return t_use.sum() + radiance.sum() + prim.sum()
            fpack, ipack = pack_prim_shade(arrays, static, jnp)
            pf, mat_idx, sfields = gather_prim_shade_packed(fpack, ipack,
                                                            pidx, static)
            if point == "gather":
                return (t_use.sum() + radiance.sum()
                        + sum(x.sum() for x in pf._asdict().values()
                              if x is not None)
                        + mat_idx.sum())
            det = detail_fn(pf, o, d, time_, t_use, jnp)
            sc = shade(arrays, mat_idx, det, d, bb, static, jnp,
                       sf=sfields)
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

    which = [int(x) for x in sys.argv[1:]] or [0, 1]
    for k in which:
        (state, slots, hb), rows = seg_input(k)
        b0, nb, entry = segs[k]
        n_lanes = state.o.shape[0]
        print(f"\n=== segment {k}: bounce {b0} x{nb}, lanes {n_lanes}, "
              f"rows={'yes' if rows is not None else 'no'}, "
              f"entry={entry}", flush=True)
        prev = t_sync
        for point in ("nothing", "trace", "gather", "shade", "full"):
            g = cut(point, rows)
            t = timeit(lambda: np.asarray(g(state, jnp.uint32(b0))))
            print(f"  {point:8s} {t*1e3:8.1f} ms  "
                  f"(delta {(t-prev)*1e3:+7.1f})", flush=True)
            prev = t
        # The real fused segment (scan over nb bounces) for reference.
        if rows is not None:
            t = timeit(lambda: np.asarray(jax.block_until_ready(
                scanrows_jit(arrays, bvh, state, jnp.uint32(b0), nb,
                             rows)).radiance.sum()))
        else:
            t = timeit(lambda: np.asarray(jax.block_until_ready(
                scan_jit(arrays, bvh, state, jnp.uint32(b0),
                         nb)).radiance.sum()))
        print(f"  fused segment scan: {t*1e3:8.1f} ms", flush=True)
        if entry is not None:
            buckets, dropb = entry
            t = timeit(lambda: np.asarray(jax.block_until_ready(
                compact_jit(state, slots, buckets, dropb, hb)
            )[0].o.sum()))
            print(f"  compaction ({sum(buckets)}+{dropb}): "
                  f"{t*1e3:8.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
