"""Phase breakdown of one bench rep on the real TPU.

Answers: of the ~1.8 s/rep the bench measures (final scene, 400x225x16spp
depth 10 compacted), how much is intersection vs shading vs compaction vs
host syncs vs the 17 MB accumulator readback?  Optimisation targets are
chosen from this table, not from intuition (round-2 lesson: the cluster
intersector optimised a phase that turned out not to dominate).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.render import (
    T_MIN,
    block_order,
    make_compacting_renderer,
    make_ray_colorer,
    prepare_scene,
)

W, H, SPP, DEPTH = 400, 225, 16, 10
N = W * H * SPP


def timeit(fn, reps=3):
    """Best-of-reps wall time; fn must materialise host-side itself."""
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
    arrays, bvh, mode = prepare_scene(scene)  # auto -> sweep
    basis = make_basis(scene.camera, W, H)
    colorer = make_ray_colorer(scene, W, H, DEPTH, mode,
                               differentiable=False)

    pix = jnp.asarray(np.tile(block_order(W, H), SPP))
    sam = jnp.asarray(np.repeat(np.arange(SPP, dtype=np.int32), W * H))
    arrays, bvh, basis = jax.device_put((arrays, bvh, basis))

    init_jit = jax.jit(colorer.init_state)
    state = jax.block_until_ready(init_jit(basis, pix, sam, np.uint32(0)))

    def ssum(st):
        return (st.radiance.sum() + st.o.sum() + st.d.sum()
                + st.throughput.sum()
                + st.alive.sum(dtype=jnp.float32))

    # --- sync floor: scalar round trip
    one = jnp.float32(1.0) + state.time[0] * 0
    t_sync = timeit(lambda: np.asarray(one * 1.0), reps=5)

    # --- init (camera rays + RNG)
    t_init = timeit(lambda: np.asarray(
        ssum(init_jit(basis, pix, sam, np.uint32(0)))))

    # --- trace only, full wavefront
    from hyper_ray_tracer_tpu.ops.bvh import make_scan_intersector
    trace = make_scan_intersector(scene.static, scene.arrays.geom)
    tr = jax.jit(lambda o, d, t, b, a: trace(
        arrays.geom, o, d, t, T_MIN, b, a)[0].sum())
    t_trace = timeit(lambda: np.asarray(
        tr(state.o, state.d, state.time, state.base, state.alive)))

    # --- one full bounce (trace + gathers + shade), full wavefront
    scan_jit = jax.jit(colorer.bounce_scan, static_argnums=(4,))
    t_step = timeit(lambda: np.asarray(ssum(
        scan_jit(arrays, bvh, state, jnp.uint32(0), 1))))

    # --- ten full bounces, no compaction (fixed-shape scan)
    t_scan10 = timeit(lambda: np.asarray(ssum(
        scan_jit(arrays, bvh, state, jnp.uint32(0), DEPTH))))

    # --- compaction machinery at a realistic milestone-1 bucket
    after1 = jax.block_until_ready(
        scan_jit(arrays, bvh, state, jnp.uint32(0), 1))
    n_alive = int(np.asarray(after1.alive.sum(dtype=jnp.int32)))
    from hyper_ray_tracer_tpu.render import _bucket_quantum, _next_bucket
    bucket = _next_bucket(n_alive, N, _bucket_quantum(N))
    slots = jnp.arange(N, dtype=jnp.int32)

    def _compact(st, sl):
        n = st.alive.shape[0]
        alive_pos = jnp.cumsum(st.alive) - 1
        dead_pos = (alive_pos[-1] + 1) + jnp.cumsum(~st.alive) - 1
        dest = jnp.where(st.alive, alive_pos, dead_pos).astype(jnp.int32)
        idx = (jnp.zeros(n, jnp.int32).at[dest]
               .set(jnp.arange(n, dtype=jnp.int32))[:bucket])
        return (st.o[idx].sum() + st.d[idx].sum() + st.time[idx].sum()
                + st.base[idx].sum() + st.throughput[idx].sum()
                + sl[idx].sum())

    cj = jax.jit(_compact)
    t_compact = timeit(lambda: np.asarray(cj(after1, slots)))

    # --- accumulator readback (the [N,3] transfer at the end of each rep)
    acc = jnp.zeros((N, 3), jnp.float32) + state.radiance
    t_read = timeit(lambda: np.asarray(acc))

    # --- the real thing
    run = make_compacting_renderer(scene, W, H, DEPTH, mode)
    perm = jax.device_put(jnp.asarray(block_order(W, H)))
    t_rep = timeit(
        lambda: run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0)))

    print(f"sync floor (scalar round trip): {t_sync*1e3:8.1f} ms")
    print(f"init_state  (camera+RNG):       {t_init*1e3:8.1f} ms")
    print(f"trace only  (1 bounce, {N/1e6:.2f}M): {t_trace*1e3:8.1f} ms")
    print(f"full bounce (trace+shade):      {t_step*1e3:8.1f} ms"
          f"   -> shade+detail ~ {(t_step-t_trace)*1e3:.1f} ms")
    print(f"10-bounce fixed scan:           {t_scan10*1e3:8.1f} ms")
    print(f"compact (N={N} -> {bucket}):    {t_compact*1e3:8.1f} ms")
    print(f"acc readback ({N*12/1e6:.1f} MB):        {t_read*1e3:8.1f} ms")
    print(f"FULL compacted rep:             {t_rep*1e3:8.1f} ms"
          f"   ({N/t_rep/1e6:.3f} Mrays/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
