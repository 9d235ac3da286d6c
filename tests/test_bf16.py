"""bf16 candidate hit tests with f32 winner re-verification.

DESIGN.md §10 / round-1 VERDICT item 6: candidate t in bf16, winner t
recomputed in f32 (render.py bounce_step).  bf16's 8 mantissa bits add
*selection* noise only — near-tied winners can swap and decision-boundary
hits can flip — so renders are not bit-identical to f32, but the image
drift must stay at Monte-Carlo-noise scale.  These tests bound it.
"""

import numpy as np
import pytest

from hyper_ray_tracer_tpu import build_scene
from hyper_ray_tracer_tpu.render import RenderSettings, render_image

SCENES = [
    # (scene, settings, bound) — three-spheres: pure static spheres
    # (all-bf16 sphere tiles, incl. the r=100 ground whose horizon band is
    # the worst case); final: mixed tiles (static+moving spheres, axis
    # rects, media, xform'd rects) so f32 and bf16 tiles fold together and
    # a selection flip can swap a 7x emitter for an occluder.  Bounds are
    # ~2x the measured drift (0.0035 / 0.0153 / 0.0006 mean |dI| at these
    # sizes); flips live only in ~0.5%-wide silhouette bands (ops/bvh.py
    # bf16 notes) and dither out with spp.
    ("three-spheres", dict(width=48, height=27, samples=8, depth=5), 0.01),
    ("final", dict(width=24, height=14, samples=4, depth=5), 0.04),
    ("random", dict(width=24, height=14, samples=4, depth=5), 0.002),
]


@pytest.mark.parametrize("name,s,bound", SCENES)
def test_bf16_image_close_to_f32(name, s, bound):
    scene = build_scene(name)
    img32 = render_image(scene, RenderSettings(**s, intersector="sweep"))
    img16 = render_image(scene, RenderSettings(**s, intersector="sweep",
                                               bf16_hits=True))
    assert img16.shape == img32.shape
    assert np.isfinite(img16).all()
    err = np.abs(img16 - img32).mean()
    assert err < bound, err


def test_bf16_flag_ignored_by_cluster_and_bvh():
    """cluster/bvh modes ignore the flag (documented no-op, not an
    error).  A round-4 cluster bf16 mode was built and REMOVED by
    measurement: a sphere's bf16 discriminant signal scales with
    (r / viewing distance)^2, and the many-small-spheres scenes cluster
    mode exists for are exactly where it rounds to zero — on the 598k
    sphereflake bf16 candidates ran 3.9x faster and silently DELETED
    whole spheres (mean radiance 1.886 -> 2.349); no build-time gate can
    know the viewing distance (ops/cluster_sweep.py docstring)."""
    s = dict(width=16, height=10, samples=2, depth=3)
    scene = build_scene("cornell")
    a = render_image(scene, RenderSettings(**s, intersector="bvh"))
    b = render_image(scene, RenderSettings(**s, intersector="bvh",
                                           bf16_hits=True))
    np.testing.assert_array_equal(a, b)

    from hyper_ray_tracer_tpu.models.builders import sphereflake

    scene = sphereflake(3, "sphereflake-3")
    s = dict(width=24, height=14, samples=2, depth=4)
    a = render_image(scene, RenderSettings(**s, intersector="cluster"))
    b = render_image(scene, RenderSettings(**s, intersector="cluster",
                                           bf16_hits=True))
    np.testing.assert_array_equal(a, b)


def test_bf16_gradients_flow_and_are_finite():
    """The f32 winner recompute keeps gradient semantics: selection is a
    fixed decision, the selected primitive's geometry gets exact f32
    gradients."""
    import jax
    import jax.numpy as jnp

    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.render import make_ray_colorer, prepare_scene

    W, H, D = 24, 14, 3
    scene = build_scene("three-spheres")
    arrays, bvh, mode = prepare_scene(scene, "sweep")
    basis = make_basis(scene.camera, W, H)
    rc = make_ray_colorer(scene, W, H, D, mode, bf16_hits=True)
    pix = jnp.arange(W * H, dtype=jnp.int32)
    sam = jnp.zeros(W * H, jnp.int32)

    def loss(p0):
        a = arrays._replace(geom=arrays.geom._replace(p0=p0))
        return rc(a, bvh, basis, pix, sam, np.uint32(0)).mean()

    g = jax.jit(jax.grad(loss))(arrays.geom.p0)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0
