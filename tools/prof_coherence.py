"""Measure secondary-ray coherence for the cluster intersector
(VERDICT r2 task 2).

Two measurements on the sphereflake (the committed cluster workload):

1. Per-tile cluster overlap by bounce: after each bounce, pack the alive
   lanes (a) in launch order (what plain compaction preserves) and
   (b) sorted by the origin-cell x direction-octant coherence key —
   then count how many cluster AABBs each RAY_TILE window overlaps
   (Phase A of ops/cluster_sweep).  The overlap count IS the per-tile
   work the culled sweep cannot skip.

2. End-to-end: the full compacted cluster render with coherence_sort
   on vs off.

Usage: python tools/prof_coherence.py [--width 400] [--height 225]
         [--spp 4] [--depth 10] [--reps 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=225)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scene", default="sphereflake")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu import build_scene
    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.models.clusters import build_clusters
    from hyper_ray_tracer_tpu.ops.cluster_sweep import (
        RAY_TILE,
        make_coherence_key,
    )
    from hyper_ray_tracer_tpu.render import (
        T_MIN,
        block_order,
        make_compacting_renderer,
        make_ray_colorer,
        prepare_scene,
    )

    scene = build_scene(a.scene)
    W, H, SPP = a.width, a.height, a.spp
    arrays, bvh, mode = prepare_scene(scene, "cluster")
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = jax.device_put(make_basis(scene.camera, W, H))
    _, layout = build_clusters(scene.arrays.geom, scene.static.n_prims)
    key_fn = make_coherence_key(layout)
    cb = [(jnp.asarray(r.cmin), jnp.asarray(r.cmax)) for r in layout.runs]
    n_clusters = sum(r.n_clusters for r in layout.runs)

    colorer = make_ray_colorer(scene, W, H, a.depth, "cluster",
                               differentiable=False)
    perm = jnp.asarray(block_order(W, H))
    pix = jnp.tile(perm, SPP)
    sam = jnp.repeat(jnp.arange(SPP, dtype=jnp.int32), W * H)

    def pack_plain(alive):
        """Stable alive-first permutation (what plain compaction does)."""
        n = alive.shape[0]
        cum = jnp.cumsum(alive)
        pos = jnp.where(alive, cum - 1, cum[-1] + jnp.arange(n) - cum)
        return (jnp.zeros(n, jnp.int32)
                .at[pos.astype(jnp.int32)]
                .set(jnp.arange(n, dtype=jnp.int32), mode="drop",
                     unique_indices=True))

    def overlap_stats(o, d, alive, order):
        """Mean/max clusters overlapped per RAY_TILE window of the alive
        lanes packed first by the full permutation ``order``."""
        o = o[order]
        d = d[order]
        ok = alive[order]
        n = o.shape[0]
        pad = (-n) % RAY_TILE
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        ok = jnp.pad(ok, (0, pad))
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
        tot = None
        for cmin, cmax in cb:
            t0 = (cmin[None] - o[:, None]) * inv[:, None]
            t1 = (cmax[None] - o[:, None]) * inv[:, None]
            lo = jnp.minimum(t0, t1).max(-1)
            hi = jnp.maximum(t0, t1).min(-1)
            hit = (hi > jnp.maximum(lo, T_MIN)) & ok[:, None]
            per_tile = hit.reshape(-1, RAY_TILE, hit.shape[-1]).any(1)
            c = per_tile.sum(-1)
            tot = c if tot is None else tot + c
        has = ok.reshape(-1, RAY_TILE).any(1)
        tot = jnp.where(has, tot, 0)
        return (tot.sum() / jnp.maximum(has.sum(), 1),
                tot.max())

    @jax.jit
    def probe(arrays, bvh):
        st = colorer.init_state(basis, pix, sam, jnp.uint32(0))
        outs = []
        for b in range(a.depth - 1):
            st = colorer.bounce_step(arrays, bvh, st, jnp.uint32(b))
            key = key_fn(st.o, st.d)
            kmax = jnp.uint32(0xFFFFFFFF)
            k = jnp.where(st.alive, jnp.minimum(key, kmax - 1), kmax)
            sorted_order = jnp.argsort(k).astype(jnp.int32)
            plain = overlap_stats(st.o, st.d, st.alive,
                                  pack_plain(st.alive))
            srt = overlap_stats(st.o, st.d, st.alive, sorted_order)
            outs.append((st.alive.sum(), plain, srt))
        return outs

    print(f"# {a.scene} {W}x{H}x{SPP}spp, {n_clusters} clusters, "
          f"tile={RAY_TILE}")
    print("# bounce  alive     plain mean/max     sorted mean/max")
    for b, (n_alive, plain, srt) in enumerate(probe(arrays, bvh)):
        print(f"  {b + 1:3d}  {int(n_alive):9d}   "
              f"{float(plain[0]):7.1f} /{int(plain[1]):4d}     "
              f"{float(srt[0]):7.1f} /{int(srt[1]):4d}")

    # ---- end-to-end ----
    for sort in (False, True):
        run = make_compacting_renderer(scene, W, H, a.depth, "cluster",
                                       coherence_sort=sort)
        out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
        best = float("inf")
        for _ in range(a.reps):
            t0 = time.perf_counter()
            out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
            best = min(best, time.perf_counter() - t0)
        n_rays = W * H * SPP
        print(f"end-to-end coherence_sort={sort}: {best * 1e3:7.1f} ms  "
              f"{n_rays / best / 1e6:6.3f} Mrays/s  "
              f"mean={float(np.mean(out)):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
