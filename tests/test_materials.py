"""Material shading semantics vs closed forms (materials/*.rs).

Each test builds a tiny scene containing the material under test, fabricates
a hit wavefront, and checks ``shade`` against the reference's scatter math:
  lambertian   lambertian.rs:27-38
  metal        metal.rs:29-42
  dielectric   dielectric.rs:31-55
  diffuse_light diffuse_light.rs:21-27
  isotropic    isotropic.rs:27-33
"""

import numpy as np

from hyper_ray_tracer_tpu.models.builders import _CAM_STANDARD
from hyper_ray_tracer_tpu.models.scene import SceneBuilder
from hyper_ray_tracer_tpu.ops import math as m
from hyper_ray_tracer_tpu.ops import rng as prng
from hyper_ray_tracer_tpu.ops.intersect import HitDetail
from hyper_ray_tracer_tpu.ops.materials import shade


def _scene_with(add_mats):
    b = SceneBuilder()
    ids = add_mats(b)
    for i, mat in enumerate(ids):
        b.sphere((float(i * 3), 0.0, 0.0), 1.0, mat)
    return b.finalize(_CAM_STANDARD, (0, 0, 0), "mattest"), ids


def _hit(n, normal=(0.0, 1.0, 0.0), front=True, point=(0.0, 1.0, 0.0),
         u=0.25, v=0.75):
    return HitDetail(
        point=np.tile(np.float32(point), (n, 1)),
        normal=np.tile(np.float32(normal), (n, 1)),
        front_face=np.full(n, front, bool),
        u=np.full(n, u, np.float32),
        v=np.full(n, v, np.float32),
    )


def _bases(n, seed=0):
    return prng.bounce_base(
        prng.ray_base(np.uint32(seed), np.arange(n, dtype=np.uint32),
                      np.zeros(n, np.uint32)),
        np.uint32(0),
    )


def test_lambertian_direction_and_attenuation():
    scene, (mat,) = _scene_with(
        lambda b: [b.lambertian(b.solid((0.3, 0.5, 0.7)))])
    n = 64
    det = _hit(n)
    bb = _bases(n)
    d_in = np.tile(np.float32([0.0, -1.0, 0.0]), (n, 1))
    sc = shade(scene.arrays, np.zeros(n, np.int32), det, d_in, bb,
               scene.static, np)
    # direction = normal + unit vector  (lambertian.rs:28-31)
    offset = sc.direction - det.normal
    np.testing.assert_allclose(
        np.linalg.norm(offset, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        sc.attenuation, np.tile(np.float32([0.3, 0.5, 0.7]), (n, 1)))
    assert sc.did_scatter.all()
    np.testing.assert_array_equal(sc.emitted, 0.0)


def test_metal_mirror_reflection():
    scene, (mat,) = _scene_with(lambda b: [b.metal((0.8, 0.6, 0.2), 0.0)])
    n = 8
    det = _hit(n)
    bb = _bases(n)
    d_in = np.tile(np.float32([1.0, -1.0, 0.0]), (n, 1))
    sc = shade(scene.arrays, np.zeros(n, np.int32), det, d_in, bb,
               scene.static, np)
    # fuzz = 0: direction == reflect(normalize(d), n)  (metal.rs:30-35)
    unit = d_in / np.linalg.norm(d_in, axis=-1, keepdims=True)
    expect = m.reflect(unit, np.asarray(det.normal))
    np.testing.assert_allclose(sc.direction, expect, atol=1e-6)
    np.testing.assert_allclose(
        sc.attenuation, np.tile(np.float32([0.8, 0.6, 0.2]), (n, 1)))
    assert sc.did_scatter.all()  # scattered . normal > 0 for a mirror


def test_dielectric_snell_and_branch():
    scene, (mat,) = _scene_with(lambda b: [b.dielectric(1.5)])
    n = 256
    det = _hit(n)
    bb = _bases(n)
    # 45-degree incidence from outside.
    d_in = np.tile(np.float32([1.0, -1.0, 0.0]), (n, 1))
    sc = shade(scene.arrays, np.zeros(n, np.int32), det, d_in, bb,
               scene.static, np)
    np.testing.assert_array_equal(sc.attenuation, 1.0)
    assert sc.did_scatter.all()  # dielectric always scatters

    unit = d_in / np.linalg.norm(d_in, axis=-1, keepdims=True)
    cos_t = np.minimum((-unit * det.normal).sum(-1), 1.0)
    # The reflect-vs-refract Bernoulli consumes the P_DIELECTRIC stream
    # (dielectric.rs:43-49) — predict each lane's branch exactly.
    u = prng.uniform(bb, prng.P_DIELECTRIC)
    reflected = m.reflectance(cos_t, np.float32(1.0 / 1.5)) > u
    assert reflected.any() and (~reflected).any()  # both branches exercised

    expect_refl = m.reflect(unit, np.asarray(det.normal))
    np.testing.assert_allclose(
        sc.direction[reflected], expect_refl[reflected], atol=1e-6)
    # Snell's law for the refracted lanes: sin_out = sin_in / ior.
    refr = sc.direction[~reflected]
    refr = refr / np.linalg.norm(refr, axis=-1, keepdims=True)
    sin_out = np.sqrt(refr[:, 0] ** 2 + refr[:, 2] ** 2)
    np.testing.assert_allclose(
        sin_out, np.sin(np.pi / 4) / 1.5, atol=1e-6)
    assert (refr[:, 1] < 0).all()  # transmitted through the surface


def test_dielectric_total_internal_reflection():
    scene, (mat,) = _scene_with(lambda b: [b.dielectric(1.5)])
    n = 128
    # Inside the glass (front_face False => ratio = ior = 1.5), grazing:
    # sin_in = sin(60deg) = 0.866; ratio * sin_in = 1.3 > 1 -> must reflect
    # for EVERY lane regardless of the Schlick draw (dielectric.rs:42).
    det = _hit(n, front=False)
    ang = np.deg2rad(60.0)
    d_in = np.tile(
        np.float32([np.sin(ang), -np.cos(ang), 0.0]), (n, 1))
    bb = _bases(n)
    sc = shade(scene.arrays, np.zeros(n, np.int32), det, d_in, bb,
               scene.static, np)
    expect = m.reflect(d_in / np.linalg.norm(d_in, axis=-1, keepdims=True),
                       np.asarray(det.normal))
    np.testing.assert_allclose(sc.direction, expect, atol=1e-6)


def test_diffuse_light_emits_and_terminates():
    scene, (mat,) = _scene_with(
        lambda b: [b.diffuse_light(b.solid((4.0, 3.0, 2.0)))])
    n = 4
    det = _hit(n)
    bb = _bases(n)
    d_in = np.tile(np.float32([0.0, -1.0, 0.0]), (n, 1))
    sc = shade(scene.arrays, np.zeros(n, np.int32), det, d_in, bb,
               scene.static, np)
    np.testing.assert_allclose(
        sc.emitted, np.tile(np.float32([4.0, 3.0, 2.0]), (n, 1)))
    assert not sc.did_scatter.any()  # diffuse_light.rs:21-23


def test_isotropic_in_unit_ball():
    scene, (mat,) = _scene_with(
        lambda b: [b.isotropic(b.solid((0.2, 0.4, 0.9)))])
    n = 256
    det = _hit(n)
    bb = _bases(n)
    d_in = np.tile(np.float32([0.0, -1.0, 0.0]), (n, 1))
    sc = shade(scene.arrays, np.zeros(n, np.int32), det, d_in, bb,
               scene.static, np)
    # isotropic.rs:27-33: direction = random_in_unit_sphere (unnormalised).
    norms = np.linalg.norm(sc.direction, axis=-1)
    assert (norms <= 1.0 + 1e-6).all()
    assert norms.std() > 0.01  # not all on the surface
    np.testing.assert_allclose(
        sc.attenuation, np.tile(np.float32([0.2, 0.4, 0.9]), (n, 1)))
    assert sc.did_scatter.all()


def test_joined_pack_matches_table_gathers():
    """shade(sf=...) via the star-joined pack must equal the gather path.

    'final' exercises noise + image textures and all 5 materials;
    'random' adds the checker lane (color2 is packed only there — the
    flag-specialised layout drops it elsewhere).
    """
    from hyper_ray_tracer_tpu.models.builders import build_scene
    from hyper_ray_tracer_tpu.ops.intersect import (
        gather_prim_shade_packed,
        pack_prim_shade,
    )

    for scene_name in ("final", "random"):
        scene = build_scene(scene_name)
        arrays, static = scene.arrays, scene.static
        P = int(arrays.geom.ptype.shape[0])
        n = 512
        rs = np.random.RandomState(7)
        pidx = rs.randint(0, P, size=n).astype(np.int32)
        det = _hit(n, u=0.3, v=0.6, point=(120.0, 260.0, 250.0))
        bb = _bases(n)
        d_in = np.tile(np.float32([0.3, -0.8, 0.5]), (n, 1))

        fpack, ipack = pack_prim_shade(arrays, static, np)
        _, mat_idx, sf = gather_prim_shade_packed(fpack, ipack, pidx,
                                                  static)
        assert (mat_idx == arrays.geom.material[pidx]).all()

        a = shade(arrays, mat_idx, det, d_in, bb, static, np)
        b = shade(arrays, mat_idx, det, d_in, bb, static, np, sf=sf)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
