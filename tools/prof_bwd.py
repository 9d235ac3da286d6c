"""Backward-pass ablation profiler (VERDICT r2 task 1).

The forward got tools/prof_bounce*.py / prof_sched.py; this gives the
backward the same discipline.  One config (scene, W, H, spp, depth), one
descent (fixed / compact / partition), a ladder of measurements:

  fwd_infer    inference forward (differentiable=False, no grad)
  fwd_diff     differentiable forward (winner-t recompute), no grad
  loss_only    loss value under jit, no grad (tests fwd+reduction)
  grad_<fam>   value_and_grad w.r.t. ONE param family, others stopped
  grad_all     value_and_grad w.r.t. every family (the bench_grad path)
  grad_all_remat  same with per-bounce jax.checkpoint

Each row prints best-of-N seconds and camera Mrays/s.  The deltas between
rows localise backward cost: (grad_all - loss_only) is the whole adjoint;
(grad_geom - loss_only) vs (grad_tex - loss_only) splits residual gathers
from texture scatter-adds; remat delta prices recompute.

Usage: python tools/prof_bwd.py [--scene final] [--width 400]
         [--height 225] [--spp 8] [--depth 8]
         [--descent partition|compact|fixed] [--reps 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


FAMILIES = {
    "geom": ("geom.p0", "geom.p1", "geom.radius"),
    "mats": ("materials.albedo", "materials.fuzz", "materials.ior"),
    "tex": ("textures.color1", "textures.color2", "textures.scale"),
    "img": ("images.None",),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="final")
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=225)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--descent", default="partition",
                    choices=["partition", "compact", "fixed"])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rows", default=None,
                    help="comma-separated subset of rows to run")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu import build_scene
    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.render import (
        make_compacting_renderer,
        make_ray_colorer,
        prepare_scene,
    )
    from hyper_ray_tracer_tpu.train import (
        extract_params,
        make_loss_fn,
        measure_compact_schedule,
        measure_partition_schedule,
    )

    scene = build_scene(a.scene)
    arrays, bvh, mode = prepare_scene(scene)
    W, H, SPP, DEPTH = a.width, a.height, a.spp, a.depth
    basis = make_basis(scene.camera, W, H)
    arrays, bvh, basis = jax.device_put((arrays, bvh, basis))
    n_rays = W * H * SPP
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H))
    sam = jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                           (SPP, W * H))
    target = jnp.zeros((W * H, 3), jnp.float32)
    seed = np.uint32(0)

    sched = psched = None
    if a.descent == "partition":
        psched = measure_partition_schedule(scene, W, H, DEPTH, mode,
                                            arrays, bvh, basis, pix, sam)
        if psched is None:
            print("# no partition groups; falling back to compact",
                  file=sys.stderr)
            a.descent = "compact"
    if a.descent == "compact":
        sched = measure_compact_schedule(scene, W, H, DEPTH, mode,
                                         arrays, bvh, basis, pix, sam)

    def bench(label, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(a.reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{label:18s} {best * 1e3:9.1f} ms   "
              f"{n_rays / best / 1e6:7.3f} Mrays/s")
        return best

    rows = set(a.rows.split(",")) if a.rows else None

    def want(name):
        return rows is None or name in rows

    print(f"# {a.scene} {W}x{H}x{SPP}spp depth{DEPTH} "
          f"descent={a.descent} n_rays={n_rays}")

    # -- forward rows: the inference compacting renderer -----------------
    if want("fwd_infer"):
        run_c = make_compacting_renderer(
            scene, W, H, DEPTH, mode,
            partition_sweep=(a.descent == "partition"))
        perm = jnp.arange(W * H, dtype=jnp.int32)
        bench("fwd_infer",
              lambda: run_c(arrays, bvh, basis, perm, 0, SPP, seed))

    # -- loss ladder ------------------------------------------------------
    def make_loss(remat=False):
        return make_loss_fn(scene, W, H, DEPTH, mode, remat=remat,
                            compact_sched=sched, partition_sched=psched)

    loss_fn = make_loss()
    params = extract_params(arrays)

    if want("loss_only"):
        f = jax.jit(lambda p: loss_fn(p, arrays, bvh, basis, pix, sam,
                                      seed, target))
        bench("loss_only", f, params)

    for fam, keys in FAMILIES.items():
        if not want(f"grad_{fam}"):
            continue

        def loss_sub(p_sub, _keys=keys):
            p = {k: (p_sub[k] if k in p_sub
                     else jax.lax.stop_gradient(params[k]))
                 for k in params}
            return loss_fn(p, arrays, bvh, basis, pix, sam, seed, target)

        p_sub = {k: params[k] for k in keys if k in params}
        f = jax.jit(jax.value_and_grad(loss_sub))
        bench(f"grad_{fam}", f, p_sub)

    if want("grad_all"):
        f = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(p, arrays, bvh, basis, pix, sam, seed,
                              target)))
        bench("grad_all", f, params)

    if want("grad_all_remat"):
        loss_r = make_loss(remat=True)
        f = jax.jit(jax.value_and_grad(
            lambda p: loss_r(p, arrays, bvh, basis, pix, sam, seed,
                             target)))
        bench("grad_all_remat", f, params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
