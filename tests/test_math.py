"""Optics helpers vs hand-computed cases (reference formulas math.rs:47-62)."""

import jax.numpy as jnp
import numpy as np

from hyper_ray_tracer_tpu.ops import math as m


def test_reflect():
    v = np.float32([[1.0, -1.0, 0.0]])
    n = np.float32([[0.0, 1.0, 0.0]])
    out = m.reflect(v, n)
    np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-6)


def test_refract_straight_through():
    # Normal incidence, matched indices: direction unchanged.
    uv = np.float32([[0.0, -1.0, 0.0]])
    n = np.float32([[0.0, 1.0, 0.0]])
    out = m.refract(uv, n, np.float32(1.0), np)
    np.testing.assert_allclose(out, uv, atol=1e-6)


def test_refract_snell():
    # 45 degrees into glass (eta ratio 1/1.5): sin(theta') = sin(45)/1.5.
    s = np.sqrt(0.5).astype(np.float32)
    uv = np.float32([[s, -s, 0.0]])
    n = np.float32([[0.0, 1.0, 0.0]])
    out = m.refract(uv, n, np.float32(1.0 / 1.5), np)
    sin_out = out[0, 0] / np.linalg.norm(out[0])
    np.testing.assert_allclose(sin_out, s / 1.5, atol=1e-6)


def test_reflectance_schlick():
    # cos=1: R = r0; cos=0: R = 1.
    r0 = ((1 - 1.5) / (1 + 1.5)) ** 2
    np.testing.assert_allclose(m.reflectance(np.float32(1.0), 1.5), r0,
                               rtol=1e-5)
    np.testing.assert_allclose(m.reflectance(np.float32(0.0), 1.5), 1.0,
                               rtol=1e-5)


def test_unit_vector_sampling():
    rng = np.random.default_rng(0)
    u1 = rng.random(50_000).astype(np.float32)
    u2 = rng.random(50_000).astype(np.float32)
    v = m.unit_vector_from_uniforms(u1, u2, np)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # Uniform on sphere: each component has mean 0, var 1/3.
    assert np.abs(v.mean(0)).max() < 0.01
    np.testing.assert_allclose(v.var(0), 1 / 3, atol=0.01)


def test_in_unit_sphere_sampling():
    rng = np.random.default_rng(1)
    u = rng.random((3, 100_000)).astype(np.float32)
    p = m.in_unit_sphere_from_uniforms(u[0], u[1], u[2], np)
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0
    # |p| ~ u^(1/3): E[r] = 3/4.
    np.testing.assert_allclose(r.mean(), 0.75, atol=0.01)


def test_in_unit_disk_sampling():
    rng = np.random.default_rng(2)
    u = rng.random((2, 100_000)).astype(np.float32)
    p = m.in_unit_disk_from_uniforms(u[0], u[1], np)
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0
    np.testing.assert_allclose(r.mean(), 2 / 3, atol=0.01)  # E[r]=2/3


def test_numpy_jax_agree():
    v = np.float32([[0.3, -0.8, 0.5]])
    n = np.float32([[0.0, 1.0, 0.0]])
    a = m.refract(v / np.linalg.norm(v), n, np.float32(0.7), np)
    b = m.refract(jnp.asarray(v / np.linalg.norm(v)), jnp.asarray(n),
                  jnp.float32(0.7), jnp)
    np.testing.assert_allclose(a, np.asarray(b), atol=1e-6)
