"""Break down a full compacted pass (real TPU): where do the ms go?

bench.py's 400x225x16spp depth-10 pass is ~610 ms, but the per-bounce
schedule predicts only ~3.2 full-wavefront bounce-equivalents (~340 ms at
the measured ~104 ms/bounce).  This tool times CUMULATIVE PREFIXES of the
real scheduled descent (init, groups of bounces + compaction, flush,
reduce) — one end sync per prefix, differences give per-phase cost
without perturbing the chain with mid-stream syncs.

Run from the repo root: ``python -m tools.prof_sched``.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.render import (
    block_order,
    compact_wavefront,
    flush_wavefront,
    make_ray_colorer,
    prepare_scene,
    schedule_from_counts,
    schedule_groups,
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
    scan_jit = jax.jit(colorer.bounce_scan, static_argnums=(4,))
    counted_jit = jax.jit(colorer.bounce_scan_counted, static_argnums=(4,))
    compact_jit = jax.jit(compact_wavefront, static_argnums=(3,))
    flush_jit = jax.jit(flush_wavefront)
    reduce_jit = jax.jit(lambda acc: acc.reshape(SPP, -1, 3).sum(0))
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
    _, counts = counted_jit(arrays, bvh, st0, jnp.uint32(0), DEPTH)
    sched = schedule_from_counts(np.asarray(counts)[:-1], N)
    groups = schedule_groups(sched, DEPTH)
    print("groups:", groups, flush=True)

    one = jnp.float32(1.0)
    t_sync = timeit(lambda: np.asarray(one * 1.0), reps=5)
    print(f"sync floor: {t_sync*1e3:6.1f} ms", flush=True)

    def prefix(k, with_init_only=False):
        """Run init + groups[:k] (+flush+reduce when k == len(groups))."""
        def f():
            state = id_init(basis, perm, jnp.uint32(0))
            if with_init_only:
                return np.asarray(state.time.sum())
            acc = jnp.zeros((N, 3), jnp.float32)
            slots = jnp.arange(N, dtype=jnp.int32)
            for b0, b1, bucket in groups[:k]:
                state = scan_jit(arrays, bvh, state, jnp.uint32(b0),
                                 b1 - b0)
                if bucket is not None:
                    state, slots, acc, _ = compact_jit(state, slots, acc,
                                                       bucket)
            if k == len(groups):
                acc = flush_jit(acc, slots, state)
                return np.asarray(reduce_jit(acc)).sum()
            return np.asarray(state.radiance.sum() + acc.sum())
        return f

    t_init = timeit(prefix(0, with_init_only=True))
    print(f"init only : {t_init*1e3:7.1f} ms", flush=True)
    prev = timeit(prefix(0))
    print(f"prefix 0  : {prev*1e3:7.1f} ms  (acc+slots alloc)", flush=True)
    for k in range(1, len(groups) + 1):
        t = timeit(prefix(k))
        g = groups[k - 1]
        print(f"prefix {k:2d} : {t*1e3:7.1f} ms  (delta {(t-prev)*1e3:+7.1f})"
              f"  group {g}", flush=True)
        prev = t
    return 0


if __name__ == "__main__":
    sys.exit(main())
