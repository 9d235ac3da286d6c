"""Tune the partitioned-sweep gates on the real device.

Sweeps PART_SAVED_MIN (min measured pair-savings fraction for a
partitioned milestone, render.py) and PART_MIN_LANES (wavefront floor
below which milestones never partition, ops/partition.py) and times the
full compacted pass per config — the two gates were reasoned, not
measured (DESIGN.md section 10), and this produces the measurement.

Each config rebuilds the renderer so the probe pass re-records its
schedule under the new gates; the timed reps then run the sync-free
scheduled chain exactly as bench.py does.  Shapes repeat across configs,
so XLA's compile cache absorbs most of the per-config compile cost.

Run from the repo root on TPU: ``python -m tools.tune_part [scene]``.
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.camera import make_basis
from hyper_ray_tracer_tpu.ops import partition as P
from hyper_ray_tracer_tpu import render as R

W, H, SPP, DEPTH = 400, 225, 16, 10

SAVED_MIN_GRID = [0.05, 0.10, 0.15, 0.25, 0.40, 1.01]  # 1.01 = never partition
MIN_LANES_GRID = [16384, 65536, 262144]


def time_config(scene, arrays, bvh, basis, perm, mode, reps=3):
    run = R.make_compacting_renderer(scene, W, H, DEPTH, mode)
    out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))  # probe+compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(arrays, bvh, basis, perm, 0, SPP, np.uint32(0))
        best = min(best, time.perf_counter() - t0)
    # how many milestones actually partitioned under these gates?
    sched = next(iter(run.schedules.values()), None)
    nparts = 0
    if isinstance(sched, tuple) and len(sched) == 2 \
            and isinstance(sched[1], (list, tuple)):
        pre, entries = sched
        nparts = (pre is not None) + sum(
            1 for e in entries
            if e is not None and len(e[0]) > 1)
    return best, float(out.mean()), nparts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="final")
    ap.add_argument("--saved-grid", type=float, nargs="+",
                    default=SAVED_MIN_GRID,
                    help="PART_SAVED_MIN values to sweep")
    ap.add_argument("--lanes-grid", type=int, nargs="+",
                    default=MIN_LANES_GRID,
                    help="PART_MIN_LANES values to sweep")
    a = ap.parse_args()
    saved_grid, lanes_grid = a.saved_grid, a.lanes_grid

    scene = build_scene(a.scene)
    print("device:", jax.devices()[0], flush=True)
    arrays, bvh, mode = R.prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    perm = jax.device_put(jnp.asarray(R.block_order(W, H)))
    arrays, bvh, basis = jax.device_put((arrays, bvh, basis))
    n_rays = W * H * SPP

    base_saved, base_lanes = R.PART_SAVED_MIN, P.PART_MIN_LANES
    results = []
    for sm in saved_grid:
        R.PART_SAVED_MIN = sm
        P.PART_MIN_LANES = base_lanes
        best, mean, nparts = time_config(scene, arrays, bvh, basis, perm,
                                         mode)
        results.append(("saved_min", sm, base_lanes, best, mean, nparts))
        print(f"saved_min={sm:<5} lanes={base_lanes:<7} "
              f"{best*1e3:7.1f} ms  {n_rays/best/1e6:5.2f} Mrays/s  "
              f"partitioned_milestones={nparts}  mean={mean:.4f}",
              flush=True)
    R.PART_SAVED_MIN = base_saved
    # The first loop measured (sm, base_lanes) for every sm; skipping
    # base_lanes here is only safe when base_saved was in that grid —
    # otherwise an explicitly requested lane value would never run
    # (ADVICE r2).
    measured_base = base_saved in saved_grid
    for ml in lanes_grid:
        if ml == base_lanes and measured_base:
            continue
        P.PART_MIN_LANES = ml
        best, mean, nparts = time_config(scene, arrays, bvh, basis, perm,
                                         mode)
        results.append(("min_lanes", base_saved, ml, best, mean, nparts))
        print(f"saved_min={base_saved:<5} lanes={ml:<7} "
              f"{best*1e3:7.1f} ms  {n_rays/best/1e6:5.2f} Mrays/s  "
              f"partitioned_milestones={nparts}  mean={mean:.4f}",
              flush=True)
    P.PART_MIN_LANES = base_lanes

    best_cfg = min(results, key=lambda r: r[3])
    print(f"best: {best_cfg[0]} saved_min={best_cfg[1]} "
          f"lanes={best_cfg[2]} {best_cfg[3]*1e3:.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
