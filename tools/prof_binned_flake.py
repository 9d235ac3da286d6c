"""Why does super-binning win 2.5x on synthetic 1M but lose on the
598k flake?  Measures, on REAL flake wavefronts (post-bounce survivor
states, coherence-sorted like the compacted renderer):

  - supers/lane mean, per-super bin counts, overflow fraction at the
    production cap
  - binned vs tile-union trace time per bounce state

Usage: python -m tools.prof_binned_flake [flake_depth]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.models.builders import sphereflake
from hyper_ray_tracer_tpu.models.clusters import build_clusters
from hyper_ray_tracer_tpu.ops import cluster_sweep as CS
from hyper_ray_tracer_tpu.render import T_MIN, block_order, make_ray_colorer

W, H, SPP = 400, 225, 4


def main() -> int:
    depth_f = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    scene = sphereflake(depth_f, f"sphereflake-{depth_f}")
    n_prims = scene.static.n_prims
    print(f"# {scene.name}: {n_prims} prims", flush=True)
    geom, lay = build_clusters(scene.arrays.geom, n_prims)
    geom = jax.device_put(geom)
    run = max(lay.runs, key=lambda r: r.n_clusters)
    F = CS.SUPER_FANOUT
    S = -(-run.n_clusters // F)
    smin = np.stack([run.cmin[s * F:(s + 1) * F].min(0)
                     for s in range(S)])
    smax = np.stack([run.cmax[s * F:(s + 1) * F].max(0)
                     for s in range(S)])
    diag = np.linalg.norm(smax - smin, axis=1)
    keep = diag <= 8.0 * np.median(diag)
    print(f"# supers {S}, kept {keep.sum()} (outliers "
          f"{np.flatnonzero(~keep).tolist()})", flush=True)

    # Real wavefront states: run the cluster-mode colorer bounce by
    # bounce from a camera launch, capturing survivor (o, d, alive).
    colorer = make_ray_colorer(scene, W, H, 2, "cluster",
                               differentiable=False)
    basis = make_basis(scene.camera, W, H)
    n0 = W * H * SPP
    pix = jnp.asarray(np.tile(block_order(W, H), SPP))
    sam = jnp.repeat(jnp.arange(SPP, dtype=jnp.int32), W * H)
    arrays = jax.device_put(scene.arrays)
    bvh = None
    st = jax.jit(colorer.init_state)(basis, pix, sam, np.uint32(0))
    step = jax.jit(lambda st, i: colorer.bounce_step(arrays, bvh, st, i))

    key_fn = CS.make_coherence_key(lay)
    tr = CS.make_cluster_intersector(scene.static, lay)
    trace = jax.jit(lambda o, d, t, b, a: tr(
        geom, o, d, t, T_MIN, b, a)[0].sum())
    # A tile-union-only build for comparison.
    old = CS.BINNED_SECONDARY
    CS.BINNED_SECONDARY = False
    tr0 = CS.make_cluster_intersector(scene.static, lay)
    CS.BINNED_SECONDARY = old
    trace0 = jax.jit(lambda o, d, t, b, a: tr0(
        geom, o, d, t, T_MIN, b, a)[0].sum())

    def bench(fn, *args, reps=3):
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    for bounce in range(4):
        alive = np.asarray(st.alive)
        n_alive = int(alive.sum())
        if bounce > 0:
            # compact + coherence sort, as the renderer would
            ids = np.flatnonzero(alive)
            key = np.asarray(jax.jit(key_fn)(st.o, st.d))[ids]
            ids = ids[np.argsort(key, kind="stable")]
            o = np.asarray(st.o)[ids]
            d = np.asarray(st.d)[ids]
            tm = np.asarray(st.time)[ids]
            bb = np.asarray(st.base)[ids]
            act = np.ones(len(ids), bool)
        else:
            o, d = np.asarray(st.o), np.asarray(st.d)
            tm, bb = np.asarray(st.time), np.asarray(st.base)
            act = alive
        # host-side overlap stats (no t_best awareness: upper bound)
        on, dn = o.astype(np.float64), d.astype(np.float64)
        t0b = (smin[None] - on[:, None]) / dn[:, None]
        t1b = (smax[None] - on[:, None]) / dn[:, None]
        lo = np.minimum(t0b, t1b).max(-1)
        hi = np.maximum(t0b, t1b).min(-1)
        ovl = (hi > np.maximum(lo, T_MIN)) & act[:, None]
        ovk = ovl[:, keep]
        counts = ovk.sum(0)
        n = len(o)
        Sk = int(keep.sum())
        cap = max(CS.BIN_TILE,
                  -(-(CS.BINNED_CAP_FACTOR * n // Sk) // CS.BIN_TILE)
                  * CS.BIN_TILE)
        over = (counts > cap).sum()
        over_lanes = (ovk & (np.cumsum(ovk, 0) - 1 >= cap)).any(1).mean()
        t_new = bench(trace, jnp.asarray(o), jnp.asarray(d),
                      jnp.asarray(tm), jnp.asarray(bb), jnp.asarray(act))
        t_old = bench(trace0, jnp.asarray(o), jnp.asarray(d),
                      jnp.asarray(tm), jnp.asarray(bb), jnp.asarray(act))
        print(f"bounce {bounce}: lanes {n} (alive {n_alive})  "
              f"kept-supers/lane {ovk.sum(1).mean():.2f}  max bin "
              f"{counts.max()}  cap {cap}  over-supers {over}  "
              f"over-lane frac {over_lanes:.3f}  binned {t_new*1e3:.0f} "
              f"ms  union {t_old*1e3:.0f} ms", flush=True)
        if bounce < 3:
            st = jax.block_until_ready(step(st, jnp.uint32(bounce)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
