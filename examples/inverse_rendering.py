"""Inverse rendering demo: recover scene parameters from a target image.

Renders a ground-truth image of the three-spheres scene, perturbs the
center sphere's color and the metal sphere's albedo + fuzz, then runs adam
on the photometric MSE through the differentiable renderer until all are
recovered.  (Silhouette geometry follows the fixed-decision convention —
hit/miss is frozen in the primal — so geometry recovery needs edge-aware
estimators; shading parameters have clean gradients.)

    python examples/inverse_rendering.py [--cpu] [--steps N] [--out DIR]

Writes target.png / initial.png / recovered.png and prints the parameter
error before and after.  This is the capability the Rust reference cannot
express: the whole forward pass (camera, traversal decision recompute,
masked shading, textures) is jax.grad-able (SURVEY.md §7 M4).
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

# Runnable as a plain script from anywhere in the repo.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--out", default="artifacts/inverse")
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=90)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=6)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu import build_scene
    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.render import make_ray_colorer, prepare_scene
    from hyper_ray_tracer_tpu.train import extract_params, merge_params
    from hyper_ray_tracer_tpu.utils.image import write_png

    W, H, SPP, DEPTH = args.width, args.height, args.spp, args.depth
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    scene = build_scene("three-spheres")
    arrays, bvh, intersector = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    arrays, bvh, basis = jax.device_put((arrays, bvh, basis))

    ray_color = make_ray_colorer(scene, W, H, DEPTH, intersector)
    pix = jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32), (SPP, W * H))
    sam = jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                           (SPP, W * H))

    @jax.jit
    def render_mean(arrays_):
        rad = ray_color(arrays_, bvh, basis, pix.reshape(-1),
                        sam.reshape(-1), np.uint32(0))
        return rad.reshape(SPP, W * H, 3).mean(0)

    def to_png(path, mean_rad):
        img = np.sqrt(np.clip(np.asarray(mean_rad), 0, None))
        write_png(str(path), img.reshape(H, W, 3)[::-1])

    # Ground truth, then perturb: albedo and center of the middle sphere.
    true_params = extract_params(arrays)
    target = render_mean(arrays)
    to_png(out / "target.png", target)

    # Perturb shading parameters: the blue sphere's color lives in the
    # texture table (lambertian attenuation = texture value); the metal
    # sphere's albedo and fuzz are material constants.
    color = np.asarray(true_params["textures.color1"]).copy()
    color[1] = (0.9, 0.1, 0.6)  # wrong color
    albedo = np.asarray(true_params["materials.albedo"]).copy()
    albedo[3] = (0.2, 0.2, 0.9)  # wrong metal tint
    fuzz = np.asarray(true_params["materials.fuzz"]).copy()
    fuzz[3] = 0.4  # blurry instead of polished
    params0 = {**true_params, "textures.color1": jnp.asarray(color),
               "materials.albedo": jnp.asarray(albedo),
               "materials.fuzz": jnp.asarray(fuzz)}

    to_png(out / "initial.png", render_mean(merge_params(arrays, params0)))

    # Optimize ONLY the perturbed leaves: adam's normalized steps would
    # otherwise drift every other scene parameter (true ones included)
    # and stall the recovery.
    import optax

    from hyper_ray_tracer_tpu.train import TrainState, make_loss_fn

    free = ("textures.color1", "materials.albedo", "materials.fuzz")
    loss_fn = make_loss_fn(scene, W, H, DEPTH, intersector)
    optimizer = optax.adam(args.lr)

    def masked_step(state, arrays, bvh, basis, pix, sam, seed, target):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, arrays, bvh, basis, pix, sam, seed, target)
        grads = {k: (g if k in free else jnp.zeros_like(g))
                 for k, g in grads.items()}
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state), loss

    state = TrainState(params=params0, opt_state=optimizer.init(params0))
    step_jit = jax.jit(masked_step)

    def err(params):
        ea = float(np.abs(np.asarray(params["textures.color1"])
                          - np.asarray(true_params["textures.color1"])
                          ).max())
        ec = float(
            np.abs(np.asarray(params["materials.albedo"])
                   - np.asarray(true_params["materials.albedo"])).max()
            + np.abs(np.asarray(params["materials.fuzz"])
                     - np.asarray(true_params["materials.fuzz"])).max())
        return ea, ec

    ea0, ec0 = err(params0)
    print(f"initial error: color {ea0:.3f}, metal {ec0:.3f}")
    for k in range(args.steps):
        # Same seed as the target render: the classic fixed-noise-
        # realization trick — with identical RNG streams the only image
        # difference is the parameters, so MSE can be driven to ~0 even at
        # low spp.  (Fresh seeds per step give unbiased but far noisier
        # gradients; at 2-4 spp the MC noise floor would swamp the signal.)
        state, loss = step_jit(state, arrays, bvh, basis, pix, sam,
                               np.uint32(0), target)
        if (k + 1) % max(args.steps // 10, 1) == 0:
            ea, ec = err(state.params)
            print(f"step {k+1:4d}: loss {float(loss):.3e} "
                  f"color err {ea:.3f} metal err {ec:.3f}", flush=True)

    to_png(out / "recovered.png",
           render_mean(merge_params(arrays, state.params)))
    ea1, ec1 = err(state.params)
    print(f"final error: color {ea1:.3f} (was {ea0:.3f}), "
          f"metal {ec1:.3f} (was {ec0:.3f})")
    return 0 if ea1 < 0.2 * ea0 and ec1 < 0.2 * ec0 else 1


if __name__ == "__main__":
    sys.exit(main())
