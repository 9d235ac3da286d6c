"""Round-5: is the schedule's milestone TAIL worth its compactions?

The canned flagship schedule compacts after every bounce (9 milestones).
Scans at <=131k lanes cost ~2-6 ms while a partitioned compaction pays
category cumsums + permutation + row gathers + a drop-log entry — at
small lane counts the compaction may cost more than the lanes it
removes.  Times the pipelined production chunk (prof_rep5 form) for
tail-pruned variants of the canned schedule; the on-device overflow
flag guards correctness (pruning only merges segments — dead lanes ride
longer and leave at the next surviving milestone, radiance preserved).

Usage: python -m tools.tune_tail5
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.render import (
    block_order,
    make_compacting_renderer,
    prepare_scene,
)

W, H, SPP, DEPTH = 400, 225, 16, 10

PRE = ((0, 81920, 540672, 917504), 0)
ENTRIES = [
    ((32768, 32768, 540672, 409600), 638976),
    ((32768, 32768, 311296, 262144), 475136),
    ((16384, 32768, 196608, 163840), 294912),
    ((16384, 32768, 131072, 114688), 180224),
    ((16384, 32768, 98304, 81920), 131072),
    ((16384, 32768, 81920, 65536), 98304),
    ((16384, 16384, 65536, 49152), 81920),
    ((16384, 16384, 65536, 49152), 49152),
    ((16384, 16384, 49152, 49152), 65536),
]


def variant(keep_until):
    """Prune milestones from index ``keep_until`` on (None = no compact)."""
    ents = [e if i < keep_until else None for i, e in enumerate(ENTRIES)]
    return (PRE, tuple(ents))


def main() -> int:
    scene = build_scene("final")
    arrays, bvh, mode = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    perm0 = block_order(W, H)
    n_rays = W * H * SPP
    print(f"# {scene.name} {W}x{H}x{SPP} depth {DEPTH} on "
          f"{jax.devices()[0]}", flush=True)

    for keep in [9, 7, 6, 5, 4]:
        run = make_compacting_renderer(scene, W, H, DEPTH, mode)
        run.schedules[n_rays] = variant(keep)
        perm = jax.device_put(jnp.asarray(perm0))
        a, b, c = jax.device_put((arrays, bvh, basis))
        out = run(a, b, c, perm, 0, SPP, np.uint32(0))  # warm/compile
        mean = float(np.asarray(out).mean())
        K = 8
        for _ in range(2):
            acc = jnp.zeros((W * H, 3), jnp.float32)
            fins = []
            t0 = time.perf_counter()
            for _k in range(K):
                fins.append(run(a, b, c, perm, 0, SPP, np.uint32(0),
                                defer=True))
                if len(fins) > 1:
                    acc = acc + fins.pop(0)(to_host=False)
            acc = acc + fins.pop(0)(to_host=False)
            jax.block_until_ready(acc)
            t = (time.perf_counter() - t0) / K
        print(f"keep={keep} milestones: {t*1e3:7.1f} ms/chunk  "
              f"{n_rays/t/1e6:.2f} Mrays/s  mean {mean:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
