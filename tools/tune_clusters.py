"""Sweep MAX_CLUSTERS_PER_RUN on the sphereflake scenes (device).

The cap trades per-visit pair width (wide clusters sweep more dead
pairs) against visit-loop trips and Phase A slab work.  This measures
the full compacted cluster render per cap so the shipped constant is a
number, not a guess.

Usage: python tools/tune_clusters.py [--flake-depth 5] [--caps 256,512,...]
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
    ap.add_argument("--flake-depth", type=int, default=5)
    ap.add_argument("--caps", default="256,512,1024,2048,4096")
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=225)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.models import clusters as CL
    from hyper_ray_tracer_tpu.models.builders import sphereflake
    from hyper_ray_tracer_tpu.render import (
        block_order,
        make_compacting_renderer,
        prepare_scene,
    )

    scene = sphereflake(a.flake_depth, f"sphereflake-{a.flake_depth}")
    W, H, SPP = a.width, a.height, a.spp
    n_rays = W * H * SPP
    basis = jax.device_put(make_basis(scene.camera, W, H))
    perm = jax.device_put(jnp.asarray(block_order(W, H)))
    print(f"# {scene.name}: {scene.static.n_prims} prims, "
          f"{W}x{H}x{SPP}spp depth {a.depth}")

    for cap in (int(c) for c in a.caps.split(",")):
        CL.MAX_CLUSTERS_PER_RUN = cap
        arrays, bvh, mode = prepare_scene(scene, "cluster")
        arrays, bvh = jax.device_put((arrays, bvh))
        _, lay = CL.build_clusters(scene.arrays.geom, scene.static.n_prims)
        nc = sum(r.n_clusters for r in lay.runs)
        wmax = max(r.width for r in lay.runs)
        run = make_compacting_renderer(scene, W, H, a.depth, "cluster")
        out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
        best = float("inf")
        for _ in range(a.reps):
            t0 = time.perf_counter()
            out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
            best = min(best, time.perf_counter() - t0)
        print(f"cap={cap:5d}  clusters={nc:5d} width<={wmax:5d}  "
              f"{best * 1e3:8.1f} ms  {n_rays / best / 1e6:6.3f} Mrays/s  "
              f"mean={float(np.mean(out)):.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
