"""Forward+backward (inverse-rendering) throughput — BASELINE.md target 1.

Not the driver bench (that is bench.py); run manually:
    python bench_grad.py [scene] [W] [H] [SPP] [DEPTH]

Prints one JSON line: camera Mrays/s through a full adam train step
(forward render + backward pass w.r.t. every scene parameter + update).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu import build_scene
    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.render import prepare_scene
    from hyper_ray_tracer_tpu.train import make_train_step

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="random")
    # Defaults saturate the chip: 400x225x8 = 720k rays measured as the
    # fwd+bwd sweet spot on TPU v5e (tools/prof_bwd.py; 44.8k-ray launches
    # under-report by ~2.4x; 1.44M regresses ~11% — NOT residual-memory
    # pressure: per-bounce remat leaves it at 1.18 Mrays/s either way).
    ap.add_argument("width", nargs="?", type=int, default=400)
    ap.add_argument("height", nargs="?", type=int, default=225)
    ap.add_argument("spp", nargs="?", type=int, default=8)
    ap.add_argument("depth", nargs="?", type=int, default=8)
    ap.add_argument("--remat", action="store_true",
                    help="force per-bounce remat (auto for depth > 16): "
                         "trades recompute for backward-residual memory")
    ap.add_argument("--compact", action="store_true",
                    help="train through the scheduled compacted descent "
                         "(one extra counted probe pass; gradients are "
                         "bit-identical to the fixed scan)")
    # The partitioned compacted descent is the DEFAULT (VERDICT r2 task 1):
    # it is the fastest measured training forward and the one inference
    # uses.  --no-partition falls back to the fixed-depth scan (or
    # --compact's plain scheduled descent).
    ap.add_argument("--partition", action="store_true",
                    help="deprecated no-op: the partitioned descent is "
                         "the default since round 3")
    ap.add_argument("--no-partition", dest="partition",
                    action="store_false", default=True,
                    help="disable the partitioned compacted descent "
                         "(fixed-depth scan unless --compact)")
    a = ap.parse_args()
    scene_name = a.scene
    W, H, SPP, DEPTH = a.width, a.height, a.spp, a.depth

    scene = build_scene(scene_name)
    arrays, bvh, intersector = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    arrays, bvh, basis = jax.device_put((arrays, bvh, basis))

    n_rays = W * H * SPP
    # loss_fn takes [S, W*H]-shaped ids (see train.make_loss_fn).
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32),
                           (SPP, W * H))
    sam = jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                           (SPP, W * H))
    target = jnp.zeros((W * H, 3), jnp.float32)

    sched = psched = None
    if a.partition:
        from hyper_ray_tracer_tpu.train import measure_partition_schedule

        psched = measure_partition_schedule(scene, W, H, DEPTH, intersector,
                                            arrays, bvh, basis, pix, sam)
        print(f"# partition schedule: {psched}", file=sys.stderr)
        if psched is None:
            print("# no dynamic partition groups: falling back to the "
                  "plain compacted schedule", file=sys.stderr)
            a.compact = True
    if a.compact and psched is None:
        from hyper_ray_tracer_tpu.train import measure_compact_schedule

        sched = measure_compact_schedule(scene, W, H, DEPTH, intersector,
                                         arrays, bvh, basis, pix, sam)
        print(f"# compact schedule: {sched}", file=sys.stderr)
    init, step = make_train_step(scene, W, H, DEPTH, intersector,
                                 remat=a.remat or DEPTH > 16, compact_sched=sched,
                                 partition_sched=psched)

    state = init(arrays)
    step_jit = jax.jit(step)
    state2, loss = step_jit(state, arrays, bvh, basis, pix, sam,
                            np.uint32(0), target)
    _ = np.asarray(loss)  # true sync (compile + tunnel warmup)

    reps = 5
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state2, loss = step_jit(state, arrays, bvh, basis, pix, sam,
                                np.uint32(0), target)
        _ = np.asarray(loss)
        best = min(best, time.perf_counter() - t0)

    mrays = n_rays / best / 1e6
    print(json.dumps({
        "metric": f"{scene_name}_fwd_bwd_camera_mrays_per_s_depth{DEPTH}",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "seconds_per_step": round(best, 4),
        "loss": float(np.asarray(loss)),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
