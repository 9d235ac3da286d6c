"""Hollow-glass shell FD rig (VERDICT r4 task 5): measure how much of
the finite-difference derivative each estimator configuration captures
for a source seen THROUGH a hollow glass shell (BASELINE config 2's
negative-radius pair).

Configs measured:
  off      no silhouette correction at all (interior term only)
  direct   shells excluded from the glass families (round-5 default
           before the shell family): direct-curve + external-mirror
  shell    + the 4-interface shell family (if wired)

Usage: python -m tools.prof_shell
"""

from __future__ import annotations

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from hyper_ray_tracer_tpu.camera import make_basis  # noqa: E402
from hyper_ray_tracer_tpu.models.scene import (  # noqa: E402
    CameraConfig,
    SceneBuilder,
)
from hyper_ray_tracer_tpu.ops.edges import (  # noqa: E402
    glass_shell_pairs_of,
    glass_sphere_ids_of,
    make_silhouette_correction,
)
from hyper_ray_tracer_tpu.render import (  # noqa: E402
    make_ray_colorer,
    prepare_scene,
)

SKY = (0.7, 0.8, 1.0)  # flat sky (builders.SKY)


def hollow_rig():
    """Hollow shell (outer 0.5, inner -0.45, three-spheres style) in
    front of the camera; red source sphere behind it, visible only
    through the shell's disk."""
    b = SceneBuilder()
    glass = b.dielectric(1.5)
    b.sphere((0.0, 0.0, -1.3), 0.5, glass)
    b.sphere((0.0, 0.0, -1.3), -0.45, glass)
    red = b.lambertian(b.solid((0.8, 0.1, 0.05)))
    b.sphere((0.5, 0.0, -3.0), 0.5, red)
    cam = CameraConfig((0.0, 0.0, 0.0), (0.0, 0.0, -1.0), 60.0, 0.0,
                       focus_dist=1.0)
    scene = b.finalize(cam, SKY, "hollow-glass-rig")
    from hyper_ray_tracer_tpu.models.scene import MT_LAMBERTIAN
    mt = np.asarray(scene.arrays.materials.mtype)[
        np.asarray(scene.arrays.geom.material)[:scene.static.n_prims]]
    prim = int(np.flatnonzero(mt == MT_LAMBERTIAN)[0])
    return scene, prim


def main():
    Wg, Hg, spp, depth = 64, 36, 32, 7  # 4 glass interfaces + source + sky
    scene, prim = hollow_rig()
    shells = glass_shell_pairs_of(scene)
    print(f"shell pairs: {shells.tolist()}, solid glass ids: "
          f"{glass_sphere_ids_of(scene).tolist()}")
    assert len(shells) == 1

    arrays, bvh, mode = prepare_scene(scene)
    arrays, bvh = jax.device_put((arrays, bvh))
    basis = make_basis(scene.camera, Wg, Hg)
    ray_color = make_ray_colorer(scene, Wg, Hg, depth, mode)
    pix = jnp.broadcast_to(jnp.arange(Wg * Hg, dtype=jnp.int32),
                           (spp, Wg * Hg))
    sam = jnp.broadcast_to(jnp.arange(spp, dtype=jnp.int32)[:, None],
                           (spp, Wg * Hg))

    # Loss window: the shell's projected disk (the through-image region).
    xs = (np.arange(Wg) + 0.5) / (Wg - 1)
    ys = (np.arange(Hg) + 0.5) / (Hg - 1)
    cnp = np.array([0.0, 0.0, -1.3])
    llc = np.asarray(basis.lower_left)
    hor = np.asarray(basis.horizontal)
    ver = np.asarray(basis.vertical)
    org = np.asarray(basis.origin)
    mask = np.zeros(Wg * Hg, bool)
    for j in range(Hg):
        for i in range(Wg):
            d = llc + xs[i] * hor + ys[j] * ver - org
            oc = org - cnp
            bq = oc @ d
            disc = bq * bq - (d @ d) * (oc @ oc - 0.25)
            mask[j * Wg + i] = disc > 0
    mask_j = jnp.asarray(mask.astype(np.float32))[:, None]
    print(f"disk window: {mask.sum()} px")

    def run(corr):
        def image_fn(dx):
            p0 = arrays.geom.p0.at[prim, 0].add(dx)
            p1 = arrays.geom.p1.at[prim, 0].add(dx)
            a = arrays._replace(geom=arrays.geom._replace(p0=p0, p1=p1))
            rad = ray_color(a, bvh, basis, pix.reshape(-1),
                            sam.reshape(-1), np.uint32(0))
            img = rad.reshape(spp, Wg * Hg, 3).mean(0)
            if corr is not None:
                img = img + corr(a, bvh, basis, np.uint32(7))
            return img

        target = jax.lax.stop_gradient(image_fn(jnp.float32(0.2)))

        def loss(dx):
            return (((image_fn(dx) - target) ** 2) * mask_j).mean()

        f = jax.jit(loss)
        g = float(jax.jit(jax.grad(loss))(jnp.float32(0.0)))
        eps = 0.04
        fd = (float(f(jnp.float32(eps)))
              - float(f(jnp.float32(-eps)))) / (2 * eps)
        return g, fd

    g, fd = run(None)
    print(f"off:    grad {g:.6f}  fd {fd:.6f}  ratio {g/(fd or 1e-12):.3f}")
    import numpy as _np
    corr = make_silhouette_correction(scene, Wg, Hg, depth, mode,
                                      n_edge=128,
                                      glass_shells=_np.zeros((0, 2)))
    g, fd = run(corr)
    print(f"direct: grad {g:.6f}  fd {fd:.6f}  ratio {g/(fd or 1e-12):.3f}")
    corr = make_silhouette_correction(scene, Wg, Hg, depth, mode,
                                      n_edge=128)
    g, fd = run(corr)
    print(f"shell:  grad {g:.6f}  fd {fd:.6f}  ratio {g/(fd or 1e-12):.3f}")


if __name__ == "__main__":
    main()
