"""Break down a full compacted pass (real TPU): where do the ms go?

Times CUMULATIVE PREFIXES of the real scheduled descent (init,
pre-partition, per-segment bounces + compactions, flush, reduce) — one
end sync per prefix, differences give per-phase cost without perturbing
the chain with mid-stream syncs.  Profiles whatever schedule the
compacting renderer would actually run (partitioned on scenes with
groups, plain otherwise); ``--no-part`` forces the plain path.

Run from the repo root: ``python -m tools.prof_sched [scene]``.
"""

import argparse
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
    schedule_from_counts,
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
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="final")
    ap.add_argument("--no-part", action="store_true")
    a = ap.parse_args()

    scene = build_scene(a.scene)
    print("device:", jax.devices()[0], flush=True)
    arrays, bvh, mode = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    colorer = make_ray_colorer(scene, W, H, DEPTH, mode,
                               differentiable=False)
    pg = () if a.no_part else colorer.part_groups
    use_part = len(pg) > 0

    def _compact(state, slots, buckets, dropb, hb):
        gs = pg if len(buckets) > 1 else ()
        return compact_wavefront_part(state, slots, buckets, dropb,
                                      gs, hole_base=hb)

    scan_jit = jax.jit(colorer.bounce_scan, static_argnums=(4,))
    scanrows_jit = jax.jit(colorer.bounce_scan_rows, static_argnums=(4, 5))
    compact_jit = jax.jit(_compact, static_argnums=(2, 3, 4))

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

    # Tunnel warmup on a trivial transfer BEFORE any heavy compile, so a
    # hang here is diagnosable as the (minutes-long, variable) first
    # device->host transfer rather than a compile-service stall.
    t0 = time.perf_counter()
    np.asarray(jnp.float32(1.0) + perm[0] * 0)
    print(f"warmup transfer: {time.perf_counter()-t0:.1f} s", flush=True)

    # Probe: survival curve -> schedule.
    st0 = id_init(basis, perm, jnp.uint32(0))
    if use_part:
        def counted(arrays, bvh, state):
            pre = colorer.cat_counts(state)
            st, counts = colorer.bounce_scan_counted_cats(
                arrays, bvh, state, jnp.uint32(0), DEPTH)
            return st, pre, counts

        _, pre_c, cat_c = jax.jit(counted)(arrays, bvh, st0)
        pre, entries = schedule_from_cat_counts(
            np.asarray(pre_c), np.asarray(cat_c)[:-1], N, pg,
            scene.static.n_prims)
    else:
        _, counts = jax.jit(colorer.bounce_scan_counted,
                            static_argnums=(4,))(
            arrays, bvh, st0, jnp.uint32(0), DEPTH)
        sched = schedule_from_counts(np.asarray(counts)[:-1], N)
        pre = None
        entries = [None if b is None else ((b,), N) for b in sched]
    print("pre:", pre, flush=True)
    for i, e in enumerate(entries):
        print(f"  entry {i}: {e}", flush=True)

    # Segment plan: (b0, nb, entry-or-None), pre handled separately.
    segs = list(schedule_segments(entries, DEPTH))

    one = jnp.float32(1.0)
    t_sync = timeit(lambda: np.asarray(one * 1.0), reps=5)
    print(f"sync floor: {t_sync*1e3:6.1f} ms", flush=True)

    def prefix(k, with_pre=True):
        """init (+pre) + segs[:k]; full pipeline when k == len(segs)."""
        def f():
            state = id_init(basis, perm, jnp.uint32(0))
            slots = jnp.arange(N, dtype=jnp.int32)
            rows = None
            drops = []
            hb = N
            if pre is not None and with_pre:
                state, slots, drop, _ = compact_jit(state, slots,
                                                    pre[0], pre[1], hb)
                drops.append(drop)
                hb += sum(pre[0]) + pre[1]
                rows = P.group_rows(pg, pre[0])
            for b0, nb, entry in segs[:k]:
                if rows is not None:
                    state = scanrows_jit(arrays, bvh, state,
                                         jnp.uint32(b0), nb, rows)
                else:
                    state = scan_jit(arrays, bvh, state, jnp.uint32(b0),
                                     nb)
                if entry is not None:
                    buckets, dropb = entry
                    state, slots, drop, _ = compact_jit(state, slots,
                                                        buckets, dropb,
                                                        hb)
                    drops.append(drop)
                    hb += sum(buckets) + dropb
                    rows = (P.group_rows(pg, buckets)
                            if len(buckets) > 1 else None)
            if k == len(segs):
                return np.asarray(finish_jit(state, slots,
                                             tuple(drops))).sum()
            return np.asarray(state.radiance.sum()
                              + sum(r.sum() for r, _ in drops))
        return f

    prev = timeit(prefix(0, with_pre=False))
    print(f"init only : {prev*1e3:7.1f} ms", flush=True)
    if pre is not None:
        prev = timeit(prefix(0))
        print(f"init+pre  : {prev*1e3:7.1f} ms", flush=True)
    for k in range(1, len(segs) + 1):
        t = timeit(prefix(k))
        print(f"prefix {k:2d} : {t*1e3:7.1f} ms  "
              f"(delta {(t-prev)*1e3:+7.1f})  seg {segs[k-1]}", flush=True)
        prev = t
    return 0


if __name__ == "__main__":
    sys.exit(main())
