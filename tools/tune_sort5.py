"""Round-5 coherence-key sweep on the 598k flake (VERDICT r4 task 4).

The 1M synthetic shows sorting is worth 4.25x on incoherent rays
(tools/prof_sec1m.py: raw 2,224 ms -> sorted 523 ms), so the flake's
remaining wall may be sort QUALITY, not the tile model.  Sweeps the
coherence-key parameters (cell_bits, scheme) through the full compacted
renderer on the 597,872-sphere flake.

Usage: python -m tools.tune_sort5
"""

from __future__ import annotations

import functools
import json
import sys
import time


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.models.builders import sphereflake
    from hyper_ray_tracer_tpu.ops import cluster_sweep as CS
    from hyper_ray_tracer_tpu.render import (
        block_order,
        make_compacting_renderer,
        prepare_scene,
    )

    scene = sphereflake(6, "sphereflake-6")
    print(f"# {scene.name}: {scene.static.n_prims} primitives",
          file=sys.stderr, flush=True)
    W, H, SPP, DEPTH = 400, 225, 4, 10
    n_rays = W * H * SPP
    basis = jax.device_put(make_basis(scene.camera, W, H))
    perm = jax.device_put(jnp.asarray(block_order(W, H)))
    arrays, bvh, mode = prepare_scene(scene, "cluster")
    arrays, bvh = jax.device_put((arrays, bvh))

    CONFIGS = [
        ("base_cell4", dict()),
        ("cell6", dict(cell_bits=6)),
        ("cell8", dict(cell_bits=8)),
        ("cell6_octant", dict(cell_bits=6, scheme="octant-first")),
        ("super", dict(scheme="super")),
    ]

    real_key = CS.make_coherence_key
    for name, kw in CONFIGS:
        CS.make_coherence_key = functools.partial(real_key, **kw) \
            if kw else real_key
        try:
            run = make_compacting_renderer(scene, W, H, DEPTH, mode)
            out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "config": name, "value": round(n_rays / best / 1e6, 3),
                "unit": "Mrays/s", "seconds": round(best, 3),
                "mean_radiance": round(float(np.mean(out)), 4),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)}),
                  flush=True)
        finally:
            CS.make_coherence_key = real_key
    return 0


if __name__ == "__main__":
    sys.exit(main())
