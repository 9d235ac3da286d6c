"""Inverse GEOMETRY demo: recover the cornell LIGHT's position from a
target image, through its silhouette.

Where the ceiling light sits is almost invisible to fixed-decision
gradients: which paths hit the emitter is a discrete event, so moving the
light leaves the interior gradient near zero even though the image changes
drastically.  The edge-sampled silhouette correction (ops/edges.py)
restores the boundary term — the light's rect edges carry an enormous
radiance step (emission 15 against the dim ceiling), so the directly
visible patch pulls itself back to the target position.

The demo shifts the light rect in its own plane by (dz, dx), then runs
adam on photometric MSE with ``make_loss_fn(silhouette=True)`` until the
outline snaps back.

    python examples/inverse_geometry.py [--cpu] [--steps N] [--out DIR]

Writes target.png / initial.png / recovered.png and prints the light
position error before and after.  The Rust reference (application.rs
cornell scene) has no gradients of any kind; this exercises the
north-star differentiability claim on geometry seen only through its
occlusion boundary.
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
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--lr", type=float, default=2.0)
    ap.add_argument("--out", default="artifacts/inverse_geometry")
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=4)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from hyper_ray_tracer_tpu import build_scene
    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.models.scene import MT_DIFFUSE_LIGHT
    from hyper_ray_tracer_tpu.render import make_ray_colorer, prepare_scene
    from hyper_ray_tracer_tpu.train import (
        TrainState,
        extract_params,
        make_loss_fn,
        merge_params,
    )
    from hyper_ray_tracer_tpu.utils.image import write_png

    W, H, SPP, DEPTH = args.width, args.height, args.spp, args.depth
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    scene = build_scene("cornell")
    arrays, bvh, intersector = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    arrays, bvh, basis = jax.device_put((arrays, bvh, basis))

    # The light: the one primitive with an emissive material
    # (application.rs:679-685, ZX rect at y=554).
    g_host = scene.arrays
    mtypes = np.asarray(g_host.materials.mtype)
    mat_of_prim = np.asarray(g_host.geom.material)[: scene.static.n_prims]
    light = int(np.flatnonzero(
        mtypes[mat_of_prim] == MT_DIFFUSE_LIGHT)[0])
    print(f"light = primitive {light}")

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
        img = np.sqrt(np.clip(np.asarray(mean_rad), 0, 1))
        write_png(str(path), img.reshape(H, W, 3)[::-1])

    true_params = extract_params(arrays)
    target = render_mean(arrays)
    to_png(out / "target.png", target)

    # Shift the light IN ITS PLANE: a ZX rect stores p0 = (a0, b0, k) =
    # (z0, x0, y); moving (dz, dx) shifts components 0 and 1 of both
    # p0 and p1 (models/scene.py rect layout).
    shift = np.float32([40.0, -35.0, 0.0])
    p0 = np.asarray(true_params["geom.p0"]).copy()
    p1 = np.asarray(true_params["geom.p1"]).copy()
    p0[light] += shift
    p1[light] += shift
    params0 = {**true_params, "geom.p0": jnp.asarray(p0),
               "geom.p1": jnp.asarray(p1)}
    to_png(out / "initial.png", render_mean(merge_params(arrays, params0)))

    loss_fn = make_loss_fn(scene, W, H, DEPTH, intersector, silhouette=True)
    optimizer = optax.adam(args.lr)

    # Only the light rect's IN-PLANE parameters move (components 0, 1 =
    # a, b of the rect layout; the plane offset k stays pinned — the
    # search is for where the lamp sits on the ceiling, and freeing k
    # lets adam float the light off the plane into a local minimum).
    row = (jnp.zeros((p0.shape[0], 3), jnp.float32)
           .at[light, 0].set(1.0).at[light, 1].set(1.0))

    def masked_step(state, arrays, bvh, basis, pix, sam, seed, target):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, arrays, bvh, basis, pix, sam, seed, target)
        grads = {k: (g * row if k in ("geom.p0", "geom.p1")
                     else jnp.zeros_like(g))
                 for k, g in grads.items()}
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state), loss

    state = TrainState(params=params0, opt_state=optimizer.init(params0))
    step_jit = jax.jit(masked_step)

    def err(params):
        d = (np.asarray(params["geom.p0"])[light]
             - np.asarray(true_params["geom.p0"])[light])
        return float(np.abs(d).max()), d

    e0, _ = err(params0)
    print(f"initial light position error: {e0:.1f} world units")
    for k in range(args.steps):
        # Fixed noise realization (same seed as the target): the only
        # image difference is the light position, so MSE is drivable
        # toward 0.
        state, loss = step_jit(state, arrays, bvh, basis, pix, sam,
                               np.uint32(0), target)
        if (k + 1) % max(args.steps // 10, 1) == 0:
            e, d = err(state.params)
            print(f"step {k+1:4d}: loss {float(loss):.3e} "
                  f"pos err {e:6.1f} (da,db,dk)=({d[0]:.1f},{d[1]:.1f},"
                  f"{d[2]:.1f})", flush=True)

    to_png(out / "recovered.png",
           render_mean(merge_params(arrays, state.params)))
    e1, _ = err(state.params)
    print(f"final light position error: {e1:.1f} (was {e0:.1f})")
    return 0 if e1 < 0.15 * e0 else 1


if __name__ == "__main__":
    sys.exit(main())
