"""Cumulative ablation of one REAL bounce step + compact sub-steps (TPU).

tools/prof_shade.py measured the shade pieces in isolation and found them
cheap (~12 ms actual) while the in-scan bounce costs ~138 ms — so either
the sweep's winner-index tracking (DCE'd when only t is consumed) or the
state merge carries the unexplained ~66 ms.  This tool ablates the actual
``bounce_step`` cumulatively so nothing is dead-code-eliminated by
accident, and splits ``compact_wavefront`` into its sub-steps.

Run from the repo root: ``python -m tools.prof_bounce``.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.ops.bvh import make_scan_intersector
from hyper_ray_tracer_tpu.render import (
    T_MIN,
    WavefrontState,
    _bucket_quantum,
    _next_bucket,
    block_order,
    compact_wavefront,
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
    print(f"sync floor:                    {t_sync*1e3:8.1f} ms", flush=True)

    trace = make_scan_intersector(static, scene.arrays.geom)

    def rep(label, f, base=0.0):
        g = jax.jit(f)
        t = timeit(lambda: np.asarray(g()))
        print(f"{label:34s} {t*1e3:8.1f} ms"
              + (f"   (delta {((t-base))*1e3:+.1f})" if base else ""),
              flush=True)
        return t

    # 1. trace, t consumed only (prim index tracking is DCE-able)
    t_t = rep("trace: sum(t) only", lambda: trace(
        arrays.geom, state.o, state.d, state.time, T_MIN, state.base,
        state.alive)[0].sum())

    # 2. trace, t AND prim consumed (forces winner-index tracking)
    def _tp():
        t, p = trace(arrays.geom, state.o, state.d, state.time, T_MIN,
                     state.base, state.alive)
        return t.sum() + p.sum()
    t_tp = rep("trace: sum(t)+sum(prim)", _tp, t_t)

    # 3. full bounce step (trace + gathers + shade + state merge)
    scan_jit = jax.jit(colorer.bounce_scan, static_argnums=(4,))

    def ssum(st):
        return (st.radiance.sum() + st.o.sum() + st.d.sum()
                + st.throughput.sum() + st.alive.sum(dtype=jnp.float32))

    t_b1 = rep("full bounce x1", lambda: ssum(
        scan_jit(arrays, bvh, state, jnp.uint32(0), 1)), t_tp)
    t_b10 = rep("full bounce x10 (scan)", lambda: ssum(
        scan_jit(arrays, bvh, state, jnp.uint32(0), 10)))
    print(f"  -> per-bounce amortised:     "
          f"{(t_b10 - t_sync)/10*1e3:8.1f} ms", flush=True)

    # --- compact sub-steps at the real milestone-1 bucket
    after1 = jax.block_until_ready(
        scan_jit(arrays, bvh, state, jnp.uint32(0), 1))
    n_alive = int(np.asarray(after1.alive.sum(dtype=jnp.int32)))
    bucket = _next_bucket(n_alive, N, _bucket_quantum(N))
    slots = jnp.arange(N, dtype=jnp.int32)
    acc = jnp.zeros((N, 3), jnp.float32)
    print(f"alive after bounce 1: {n_alive} -> bucket {bucket}", flush=True)

    def _dest(st):
        alive_pos = jnp.cumsum(st.alive) - 1
        dead_pos = (alive_pos[-1] + 1) + jnp.cumsum(~st.alive) - 1
        return jnp.where(st.alive, alive_pos, dead_pos).astype(jnp.int32)

    t_c1 = rep("compact: cumsum+dest",
               lambda: _dest(after1).sum())

    def _inv():
        dest = _dest(after1)
        return (jnp.zeros(N, jnp.int32).at[dest]
                .set(jnp.arange(N, dtype=jnp.int32), mode="drop")).sum()
    t_c2 = rep("compact: + inverse scatter", _inv, t_c1)

    def _gath():
        dest = _dest(after1)
        idx_full = (jnp.zeros(N, jnp.int32).at[dest]
                    .set(jnp.arange(N, dtype=jnp.int32), mode="drop"))
        idx = idx_full[:bucket]
        st = after1
        fpk = jnp.concatenate(
            [st.o, st.d, st.time[:, None], st.throughput, st.radiance],
            axis=-1)[idx]
        ipk = jnp.stack(
            [jax.lax.bitcast_convert_type(st.base, jnp.int32), slots],
            axis=-1)[idx]
        return fpk.sum() + ipk.sum()
    t_c3 = rep("compact: + row gathers", _gath, t_c2)

    def _full():
        g, sl, (dr, ds), ov = compact_wavefront(after1, slots, bucket)
        return (g.o.sum() + g.radiance.sum() + sl.sum() + dr.sum()
                + ds.sum(dtype=jnp.float32) + ov.astype(jnp.float32))
    t_c4 = rep("compact: full (+drop log)", _full, t_c3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
