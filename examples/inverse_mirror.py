"""Inverse rendering THROUGH A MIRROR: recover a sphere's position when
it is visible only as a reflection.

The sphere sits behind the camera; every pixel that sees it does so via
one specular bounce off a polished metal rect (the planar mirror).  With
fixed-decision gradients alone the position gradient is ~zero — which
pixels show the mirrored sphere is a discrete event.  The silhouette
correction's virtual-image edge families (ops/edges.py, round 3) restore
the boundary term: the sphere's silhouette is reflected across the mirror
plane and sampled like any directly-visible edge, so adam can slide the
hidden sphere back to the target position it has never been directly
seen at.

    python examples/inverse_mirror.py [--cpu] [--steps N] [--out DIR]

Writes target.png / initial.png / recovered.png and prints the position
error before and after.  No analogue in the Rust reference (no gradients
of any kind); this extends the north-star differentiability claim to
geometry visible only through specular transport.
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
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--out", default="artifacts/inverse_mirror")
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=54)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--depth", type=int, default=3)
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
        PT_SPHERE,
        CameraConfig,
        SceneBuilder,
    )
    from hyper_ray_tracer_tpu.ops.edges import mirror_rect_ids_of
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

    # A wall mirror facing the camera + a red sphere BEHIND the camera.
    b = SceneBuilder()
    b.rect(0, -0.9, 0.9, -0.55, 0.55, -1.0, b.metal((0.95, 0.95, 0.95),
                                                    0.0))
    b.sphere((0.3, 0.05, 1.2), 0.35,
             b.lambertian(b.solid((0.7, 0.15, 0.1))))
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 90.0, 0.0,
                       focus_dist=1.0)
    scene = b.finalize(cam, SKY, "inverse-mirror")
    assert len(mirror_rect_ids_of(scene)) == 1

    arrays, bvh, mode = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    arrays, bvh, basis = jax.device_put((arrays, bvh, basis))
    pt = np.asarray(scene.arrays.geom.ptype)[: scene.static.n_prims]
    sphere = int(np.flatnonzero(pt == PT_SPHERE)[0])
    print(f"hidden sphere = primitive {sphere} (behind the camera)")

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
    shift = np.float32([-0.22, 0.12, 0.0])
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
    return 0 if e1 < 0.15 * e0 else 1


if __name__ == "__main__":
    sys.exit(main())
