"""Microbenchmark: f32 vs bf16 hit-test throughput on the VPU.

DESIGN.md §10 / VERDICT round-1 item 6: before wiring bf16 candidate-t
computation (with f32 winner re-verification) into the sweep, measure
whether bf16 elementwise math is actually faster on this VPU at all.
TPU v5e packs bf16 at (16, 128) native tiling vs f32's (8, 128), so a
~2x elementwise win is *plausible* — but the VPU may also compute bf16
by upconversion, making it a wash.  This tool decides with data.

The kernel below is the sweep's inner loop shape (ops/bvh.py
make_scan_intersector): a [N-ray x TILE-prim] sphere test folded over T
tiles with a running min/argmin.  Constants are dtype-local so bf16 runs
never silently promote to f32 (jnp weak-typing would otherwise upcast on
the first strong-f32 constant).

Run on the real TPU: ``python -m tools.bench_bf16``.
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

N = 90_112  # rays (400x225 rounded to sublanes)
TILE = 512
N_TILES = 7  # ~3.4k prims: the final-scene class


def make_fold(dtype):
    big = dtype(3.0e38)

    @jax.jit
    def fold(o, d, centers, radii, t_min, t_max):
        # o,d: [N,3]; centers: [T,TILE,3]; radii: [T,TILE]
        a = (d * d).sum(-1)[:, None]  # [N,1]

        def body(i, carry):
            t_best, best = carry
            c = jax.lax.dynamic_index_in_dim(centers, i, keepdims=False)
            r = jax.lax.dynamic_index_in_dim(radii, i, keepdims=False)
            oc = o[:, None, :] - c[None]  # [N,TILE,3]
            half_b = (oc * d[:, None, :]).sum(-1)
            c2 = (oc * oc).sum(-1) - r[None] * r[None]
            disc = half_b * half_b - a * c2
            exists = disc >= dtype(0)
            sq = jnp.sqrt(jnp.maximum(disc, dtype(0)))
            inv_a = dtype(1) / a
            t_near = (-half_b - sq) * inv_a
            t_far = (-half_b + sq) * inv_a
            ok1 = exists & (t_near >= t_min) & (t_near <= t_max)
            ok2 = exists & (t_far >= t_min) & (t_far <= t_max)
            t = jnp.where(ok1, t_near, jnp.where(ok2, t_far, big))
            j = jnp.argmin(t, axis=1).astype(jnp.int32)
            tt = jnp.min(t, axis=1)
            upd = tt < t_best
            return (jnp.where(upd, tt, t_best),
                    jnp.where(upd, i * TILE + j, best))

        t0 = jnp.full((N,), big, dtype)
        b0 = jnp.full((N,), -1, jnp.int32)
        t_best, best = jax.lax.fori_loop(0, N_TILES, body, (t0, b0))
        return t_best, best

    return fold


def bench(fn, args, reps=5):
    out = fn(*args)
    np.asarray(out[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    print("device:", jax.devices()[0], flush=True)
    r = np.random.default_rng(0)
    o32 = r.normal(size=(N, 3)).astype(np.float32) * 5
    d32 = r.normal(size=(N, 3)).astype(np.float32)
    c32 = r.normal(size=(N_TILES, TILE, 3)).astype(np.float32) * 40
    r32 = r.uniform(0.5, 4.0, (N_TILES, TILE)).astype(np.float32)

    results = {}
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        args = jax.device_put((
            jnp.asarray(o32, dt), jnp.asarray(d32, dt),
            jnp.asarray(c32, dt), jnp.asarray(r32, dt),
            dt(1e-3), dt(3e37)))
        fold = make_fold(dt)
        t = bench(fold, args)
        results[name] = t
        pairs = N * TILE * N_TILES
        print(f"{name}: {t*1e3:8.2f} ms   {pairs/t/1e9:6.1f} Gpairs/s",
              flush=True)

    # Agreement: how often does bf16 pick a different winner?
    f32_args = jax.device_put((jnp.asarray(o32), jnp.asarray(d32),
                               jnp.asarray(c32), jnp.asarray(r32),
                               jnp.float32(1e-3), jnp.float32(3e37)))
    bf_args = jax.device_put((
        jnp.asarray(o32, jnp.bfloat16), jnp.asarray(d32, jnp.bfloat16),
        jnp.asarray(c32, jnp.bfloat16), jnp.asarray(r32, jnp.bfloat16),
        jnp.bfloat16(1e-3), jnp.bfloat16(3e37)))
    _, w32 = make_fold(jnp.float32)(*f32_args)
    _, wbf = make_fold(jnp.bfloat16)(*bf_args)
    mismatch = float(np.mean(np.asarray(w32) != np.asarray(wbf)))
    print(f"winner mismatch f32 vs bf16: {mismatch*100:.2f}% of rays")
    print(f"speedup bf16/f32: {results['f32']/results['bf16']:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
