"""Cluster-intersector showcase bench (VERDICT r2 task 3).

Renders the committed 66,431-primitive ``sphereflake`` scene on the real
device under each intersector mode (and bf16 candidate hits, the
sphere-heavy regime it was built for), reporting camera Mrays/s through
the full compacted renderer — the auto policy's 'cluster' branch finally
measured on a real workload instead of synthetic K-sphere scenes
(tools/bench_crossover.py).

Usage: python tools/bench_flake.py [--width 400] [--height 225]
         [--spp 4] [--depth 10] [--reps 3] [--modes cluster,sweep]
         [--artifact out.png]
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--modes", default="cluster,cluster+bf16,sweep")
    ap.add_argument("--flake-depth", type=int, default=None,
                    help="build sphereflake(depth) instead of the "
                         "committed depth-5 scene (6 -> 597,872 prims)")
    ap.add_argument("--artifact", default=None,
                    help="also render a showcase PNG (800x450, 64 spp)")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu import build_scene
    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.render import (
        block_order,
        make_compacting_renderer,
        prepare_scene,
    )

    if a.flake_depth is not None:
        from hyper_ray_tracer_tpu.models.builders import sphereflake

        scene = sphereflake(a.flake_depth, f"sphereflake-{a.flake_depth}")
    else:
        scene = build_scene("sphereflake")
    print(f"# {scene.name}: {scene.static.n_prims} primitives",
          file=sys.stderr)
    W, H, SPP = a.width, a.height, a.spp
    n_rays = W * H * SPP
    basis = jax.device_put(make_basis(scene.camera, W, H))
    perm = jax.device_put(jnp.asarray(block_order(W, H)))

    for mode in a.modes.split(","):
        bf16 = mode.endswith("+bf16")
        ins = mode.removesuffix("+bf16")
        arrays, bvh, ins = prepare_scene(scene, ins)
        arrays, bvh = jax.device_put((arrays, bvh))
        run = make_compacting_renderer(scene, W, H, a.depth, ins,
                                       bf16_hits=bf16)
        out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
        best = float("inf")
        for _ in range(a.reps):
            t0 = time.perf_counter()
            out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "metric": f"{scene.name}_camera_mrays_per_s_depth{a.depth}",
            "mode": mode, "value": round(n_rays / best / 1e6, 3),
            "unit": "Mrays/s", "seconds": round(best, 3),
            "mean_radiance": round(float(np.mean(out)), 4),
        }))

    if a.artifact:
        from hyper_ray_tracer_tpu.render import RenderSettings, render_image
        from hyper_ray_tracer_tpu.utils.image import write_png

        t0 = time.perf_counter()
        img = render_image(scene, RenderSettings(
            width=800, height=450, samples=64, depth=a.depth))
        write_png(a.artifact, img)
        print(f"# artifact {a.artifact} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
