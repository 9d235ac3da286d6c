"""Micro-bench the compaction permutation primitives (real TPU).

prof_phases4 found the partitioned compaction = ~60-70% of segment cost
at the bench shape (121 ms at 1.54M->1.65M lanes vs ~10 ms of trace).
This tool times each candidate building block in isolation at those
shapes so the rewrite attacks the measured whale, not a guess:

  cumsum        4x category cumsums (current dest computation)
  scatter_i32   idx_full = zeros.at[dest].set(iota)   (current inversion)
  gather_rows   fpk[idx] 13-col row gather            (current apply)
  scatter_rows  out.at[dest].set(packed 15-col rows)  (fused alternative)
  argsort       stable argsort of the uint8-range category key
  sort_pairs    lax.sort of (key, iota)               (alternative inversion)
  scatter_add   drop-region radiance flush

Run from the repo root: ``python -m tools.prof_compact [N]``.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_540_096
    m = int(n * 1.07)  # dest space (buckets + drop padding)
    print(f"device: {jax.devices()[0]}  n={n} m={m}", flush=True)

    rng = np.random.default_rng(0)
    dest_np = rng.permutation(m)[:n].astype(np.int32)
    cat_np = rng.integers(0, 4, n).astype(np.uint32)
    alive_np = rng.random(n) < 0.6

    dest = jax.device_put(jnp.asarray(dest_np))
    cat = jax.device_put(jnp.asarray(cat_np))
    alive = jax.device_put(jnp.asarray(alive_np))
    rows13 = jax.device_put(jnp.asarray(
        rng.standard_normal((n, 13), dtype=np.float32)))
    rows3 = jax.device_put(jnp.asarray(
        rng.standard_normal((n, 3), dtype=np.float32)))
    idx = jax.device_put(jnp.asarray(
        rng.permutation(n)[: int(n * 0.66)].astype(np.int32)))
    acc = jax.device_put(jnp.zeros((m, 3), jnp.float32))
    slots = jax.device_put(jnp.asarray(
        rng.permutation(m)[:n].astype(np.int32)))

    one = jnp.float32(1.0)
    t_sync = timeit(lambda: np.asarray(one * 1.0), reps=5)
    print(f"sync floor: {t_sync*1e3:6.1f} ms", flush=True)

    iota = jnp.arange(n, dtype=jnp.int32)

    def run(name, f):
        g = jax.jit(f)
        t = timeit(lambda: np.asarray(jax.block_until_ready(g())).ravel()[0])
        print(f"  {name:28s} {(t - t_sync)*1e3:8.1f} ms", flush=True)

    run("cumsum x4 (cats)",
        lambda: sum(jnp.cumsum(alive & (cat == p)) for p in range(4))[-1:])
    run("cumsum x1",
        lambda: jnp.cumsum(alive.astype(jnp.int32))[-1:])
    run("scatter_i32 set (unique)",
        lambda: jnp.zeros(m, jnp.int32).at[dest].set(
            iota, mode="drop", unique_indices=True))
    run("scatter_i32 set (plain)",
        lambda: jnp.zeros(m, jnp.int32).at[dest].set(iota, mode="drop"))
    run("gather_rows 13c @0.66n",
        lambda: rows13[idx])
    run("gather_cols 13c @0.66n",
        lambda: tuple(rows13[:, j][idx] for j in range(13)))
    run("scatter_rows 13c (unique)",
        lambda: jnp.zeros((m, 13), jnp.float32).at[dest].set(
            rows13, mode="drop", unique_indices=True))
    run("argsort u32 key",
        lambda: jnp.argsort(cat).astype(jnp.int32))
    run("sort_pairs (key, iota)",
        lambda: jax.lax.sort((cat, iota), num_keys=1)[1])
    run("sort_pairs (key, 13c+iota)",
        lambda: jax.lax.sort(
            (cat, iota) + tuple(rows13[:, j] for j in range(13)),
            num_keys=1)[1])
    run("scatter_add rows3 (unique)",
        lambda: acc.at[slots].add(rows3, mode="drop",
                                  unique_indices=True))
    run("scatter_add rows3 (plain)",
        lambda: acc.at[slots].add(rows3, mode="drop"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
