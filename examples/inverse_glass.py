"""Inverse rendering THROUGH GLASS: recover a sphere's position when it
is visible only as a refracted image inside a glass ball.

The red sphere sits outside the camera frustum; the only pixels that see
it are the handful inside the glass ball's disk showing its doubly-
refracted (inverted, strongly compressed) image.  Fixed-decision
gradients alone leave the position derivative at exactly zero — which
pixels the refracted image covers is a discrete event (measured in
tests/test_edges.py::test_glass_silhouette_grad_matches_fd).  The
round-4 refractive edge family (ops/edges.py: grid-seeded doubly-
refracted chief + tangency solves) restores the boundary term, so adam
can slide the hidden sphere back to a target position it has never been
directly seen at.

    python examples/inverse_glass.py [--cpu] [--steps N] [--out DIR]

Writes target.png / initial.png / recovered.png and prints the position
error before and after.  No analogue in the Rust reference (no gradients
of any kind); together with examples/inverse_mirror.py this extends the
north-star differentiability claim to geometry visible only through
specular AND refractive transport.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--out", default="artifacts/inverse_glass")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=72)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=4)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.models.builders import SKY
    from hyper_ray_tracer_tpu.models.scene import (
        MT_LAMBERTIAN,
        CameraConfig,
        SceneBuilder,
    )
    from hyper_ray_tracer_tpu.ops.edges import glass_sphere_ids_of
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

    # Glass ball in front of the camera; red sphere OUTSIDE the frustum
    # (fov 40 vertical, aspect 16:9 -> horizontal half-width atan(0.647);
    # the sphere's near edge sits past it), so every pixel that sees it
    # does so through two refractions.
    b = SceneBuilder()
    b.sphere((0.0, 0.0, -1.5), 0.4, b.dielectric(1.5))
    b.sphere((2.6, 0.0, -3.0), 0.6,
             b.lambertian(b.solid((0.7, 0.15, 0.1))))
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 40.0, 0.0,
                       focus_dist=1.0)
    scene = b.finalize(cam, SKY, "inverse-glass")
    assert len(glass_sphere_ids_of(scene)) == 1

    arrays, bvh, mode = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    arrays, bvh, basis = jax.device_put((arrays, bvh, basis))
    mt = np.asarray(scene.arrays.materials.mtype)[
        np.asarray(scene.arrays.geom.material)[: scene.static.n_prims]]
    sphere = int(np.flatnonzero(mt == MT_LAMBERTIAN)[0])
    print(f"hidden sphere = primitive {sphere} (outside the frustum)")

    ray_color = make_ray_colorer(scene, W, H, DEPTH, mode)
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

    # Displace the hidden sphere in its own (x, y) plane.
    shift = np.float32([-0.3, 0.18, 0.0])
    p0 = np.asarray(true_params["geom.p0"]).copy()
    p1 = np.asarray(true_params["geom.p1"]).copy()
    p0[sphere] += shift
    p1[sphere] += shift
    params0 = {**true_params, "geom.p0": jnp.asarray(p0),
               "geom.p1": jnp.asarray(p1)}
    to_png(out / "initial.png", render_mean(merge_params(arrays, params0)))

    loss_fn = make_loss_fn(scene, W, H, DEPTH, mode, silhouette=True)
    optimizer = optax.adam(args.lr)
    row = (jnp.zeros((p0.shape[0], 3), jnp.float32)
           .at[sphere, 0].set(1.0).at[sphere, 1].set(1.0))

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
        d = (np.asarray(params["geom.p0"])[sphere]
             - np.asarray(true_params["geom.p0"])[sphere])
        return float(np.abs(d).max()), d

    e0, _ = err(params0)
    print(f"initial position error: {e0:.3f} world units")
    for k in range(args.steps):
        state, loss = step_jit(state, arrays, bvh, basis, pix, sam,
                               np.uint32(0), target)
        if (k + 1) % max(args.steps // 10, 1) == 0:
            e, d = err(state.params)
            print(f"step {k+1:4d}: loss {float(loss):.3e} "
                  f"pos err {e:.3f} (dx,dy)=({d[0]:+.3f},{d[1]:+.3f})",
                  flush=True)

    to_png(out / "recovered.png",
           render_mean(merge_params(arrays, state.params)))
    e1, _ = err(state.params)
    print(f"final position error: {e1:.3f} (was {e0:.3f})")
    return 0 if e1 < 0.3 * e0 else 1


if __name__ == "__main__":
    sys.exit(main())
