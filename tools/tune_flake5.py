"""Round-5 tuning sweep for the 598k-primitive regime (VERDICT r4 task 4).

Sweeps the cluster-layout/traversal knobs that bound secondary-ray cost
on two-level scenes — cluster granularity (CLUSTER_TARGET_PRIMS /
MAX_CLUSTERS_PER_RUN), ray-tile width (RAY_TILE_TWO_LEVEL), and super
fan-out (SUPER_FANOUT) — on the 597,872-sphere depth-6 flake through the
full compacted renderer (camera Mrays/s, the BASELINE.md scaling row).

Usage: python -m tools.tune_flake5 [--configs name1,name2] [--spp 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--flake-depth", type=int, default=6)
    ap.add_argument("--configs", default=None)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.models import clusters as C
    from hyper_ray_tracer_tpu.models.builders import sphereflake
    from hyper_ray_tracer_tpu.ops import cluster_sweep as CS
    from hyper_ray_tracer_tpu.render import (
        block_order,
        make_compacting_renderer,
        prepare_scene,
    )

    scene = sphereflake(a.flake_depth, f"sphereflake-{a.flake_depth}")
    print(f"# {scene.name}: {scene.static.n_prims} primitives",
          file=sys.stderr, flush=True)
    W, H, SPP = 400, 225, a.spp
    n_rays = W * H * SPP
    basis = jax.device_put(make_basis(scene.camera, W, H))
    perm = jax.device_put(jnp.asarray(block_order(W, H)))

    # (name, target_prims, max_clusters, ray_tile2, fanout)
    CONFIGS = {
        "base": (256, 4096, 1024, 64),
        "tile512": (256, 4096, 512, 64),
        "target128": (128, 8192, 1024, 64),
        "target128_tile512": (128, 8192, 512, 64),
        "target64": (64, 16384, 1024, 64),
        "fanout32": (256, 4096, 1024, 32),
        "target128_fanout32": (128, 8192, 1024, 32),
        "target128_fanout128": (128, 8192, 1024, 128),
    }
    names = (a.configs.split(",") if a.configs else list(CONFIGS))

    defaults = (C.CLUSTER_TARGET_PRIMS, C.MAX_CLUSTERS_PER_RUN,
                CS.RAY_TILE_TWO_LEVEL, CS.SUPER_FANOUT)
    for name in names:
        tgt, mx, tile, fan = CONFIGS[name]
        C.CLUSTER_TARGET_PRIMS, C.MAX_CLUSTERS_PER_RUN = tgt, mx
        CS.RAY_TILE_TWO_LEVEL, CS.SUPER_FANOUT = tile, fan
        try:
            t0 = time.perf_counter()
            arrays, bvh, mode = prepare_scene(scene, "cluster")
            arrays, bvh = jax.device_put((arrays, bvh))
            run = make_compacting_renderer(scene, W, H, a.depth, mode)
            out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
            setup = time.perf_counter() - t0
            best = float("inf")
            for _ in range(a.reps):
                t0 = time.perf_counter()
                out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "config": name, "target": tgt, "tile": tile, "fanout": fan,
                "value": round(n_rays / best / 1e6, 3), "unit": "Mrays/s",
                "seconds": round(best, 3), "setup_s": round(setup, 1),
                "mean_radiance": round(float(np.mean(out)), 4),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)}),
                  flush=True)
        finally:
            (C.CLUSTER_TARGET_PRIMS, C.MAX_CLUSTERS_PER_RUN,
             CS.RAY_TILE_TWO_LEVEL, CS.SUPER_FANOUT) = defaults
    return 0


if __name__ == "__main__":
    sys.exit(main())
