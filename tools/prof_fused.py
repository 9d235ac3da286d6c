"""Does fusing each (bounce scan, compaction) segment pair into ONE jit
help? (real TPU)

prof_phases4 measured a ~27 ms/full-wavefront gap between the fused
segment scan and the sum of its ablated pieces — suspected carry-state
materialization between the scan dispatch and the compaction dispatch.
If XLA can elide those writes when both live in one program, the pass
should shrink; if the gap is intrinsic (scatter/gather scheduling), the
numbers will match.

Times the flagship scheduled partitioned descent at the bench shape in
both forms (whole-pass best-of-3, sync-free chains).

FINDING (TPU v5e, 2026-08-19): fusing is ~22% SLOWER (410 -> 502 ms a
pass) — one program per (bounce, compaction) pair makes XLA serialize
work the split dispatch stream overlaps, and the carry materialization
it was meant to elide persists (the compaction consumes every state
column anyway).  The split-segment chain stays.

Run from the repo root: ``python -m tools.prof_fused``.
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
    assemble_radiance,
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
        return compact_wavefront_part(state, slots, buckets, dropb, gs,
                                      hole_base=hb)

    compact_jit = jax.jit(_compact, static_argnums=(2, 3, 4))
    scan_jit = jax.jit(colorer.bounce_scan, static_argnums=(4,))
    scanrows_jit = jax.jit(colorer.bounce_scan_rows, static_argnums=(4, 5))

    def _seg_fused(arrays, bvh, state, slots, b0, nb, rows, buckets,
                   dropb, hb):
        """bounce(s) + compaction in one traced program."""
        if rows is not None:
            state = colorer.bounce_scan_rows(arrays, bvh, state,
                                             jnp.uint32(b0), nb, rows)
        else:
            state = colorer.bounce_scan(arrays, bvh, state,
                                        jnp.uint32(b0), nb)
        if buckets is None:
            return state, slots, None, None
        return _compact(state, slots, buckets, dropb, hb)

    seg_fused_jit = jax.jit(_seg_fused, static_argnums=(4, 5, 6, 7, 8, 9))

    def _finish(state, slots, drops):
        acc = assemble_radiance(N, drops, state, slots)
        return acc.reshape(SPP, -1, 3).sum(0)

    finish_jit = jax.jit(_finish)

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

    def run_split():
        state = id_init(basis, perm, jnp.uint32(0))
        slots = jnp.arange(N, dtype=jnp.int32)
        rows = None
        drops = []
        hb = N
        if pre is not None:
            state, slots, drop, _ = compact_jit(state, slots, pre[0],
                                                pre[1], hb)
            drops.append(drop)
            hb += sum(pre[0]) + pre[1]
            rows = P.group_rows(pg, pre[0])
        for b0, nb, entry in segs:
            if rows is not None:
                state = scanrows_jit(arrays, bvh, state, jnp.uint32(b0),
                                     nb, rows)
            else:
                state = scan_jit(arrays, bvh, state, jnp.uint32(b0), nb)
            if entry is not None:
                buckets, dropb = entry
                state, slots, drop, _ = compact_jit(state, slots,
                                                    buckets, dropb, hb)
                drops.append(drop)
                hb += sum(buckets) + dropb
                rows = (P.group_rows(pg, buckets)
                        if len(buckets) > 1 else None)
        return np.asarray(finish_jit(state, slots, tuple(drops))).sum()

    def run_fused():
        state = id_init(basis, perm, jnp.uint32(0))
        slots = jnp.arange(N, dtype=jnp.int32)
        rows = None
        drops = []
        hb = N
        if pre is not None:
            state, slots, drop, _ = compact_jit(state, slots, pre[0],
                                                pre[1], hb)
            drops.append(drop)
            hb += sum(pre[0]) + pre[1]
            rows = P.group_rows(pg, pre[0])
        for b0, nb, entry in segs:
            buckets, dropb = entry if entry is not None else (None, None)
            state, slots, drop, _ = seg_fused_jit(
                arrays, bvh, state, slots, b0, nb, rows, buckets, dropb,
                hb)
            if entry is not None:
                drops.append(drop)
                hb += sum(buckets) + dropb
                rows = (P.group_rows(pg, buckets)
                        if len(buckets) > 1 else None)
        return np.asarray(finish_jit(state, slots, tuple(drops))).sum()

    a = timeit(run_split)
    b = timeit(run_fused)
    print(f"split segments: {a*1e3:7.1f} ms  ({N/a/1e6:.2f} Mrays/s)",
          flush=True)
    print(f"fused segments: {b*1e3:7.1f} ms  ({N/b/1e6:.2f} Mrays/s)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
