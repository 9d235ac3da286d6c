"""Optics helpers and closed-form random sampling.

Reproduces the semantics of the reference's free math functions
(`/root/reference/src/math.rs:12-62`) with two TPU-native changes:

* Rejection sampling (``random_in_unit_sphere`` / ``random_in_unit_disk``,
  math.rs:16-40) is replaced by *closed-form* transforms of counter-based
  uniforms.  Rejection loops have data-dependent trip counts, which XLA cannot
  compile efficiently; the closed forms produce the identical distributions
  (uniform-on-sphere, uniform-in-ball, uniform-in-disk) from a fixed number of
  draws, which also makes the renderer reproducible and differentiable.

* All functions take an ``xp`` module argument (numpy or jax.numpy) so the
  scalar NumPy oracle and the vectorised JAX renderer share one source of
  truth.  Shapes are ``(..., 3)`` for vectors.

Conventions match the reference exactly:
  reflect      math.rs:47-49
  refract      math.rs:51-56  (Snell with clamped cos, |perp|^2 abs-sqrt)
  reflectance  math.rs:58-62  (Schlick)
"""

from __future__ import annotations

import numpy as np

_SQRT_GRAD_CAP = 1.0e5


def _make_capped_sqrt():
    """sqrt with a bounded derivative (JAX only; lazy import).

    At geometric silhouettes (ray grazing a sphere) the discriminant crosses
    zero and d sqrt/d disc -> inf, overflowing f32 gradients for pixels that
    land within ~1e-7 of tangency (guaranteed somewhere along a horizon).
    The primal is exact; only the VJP is clipped — the standard edge-gradient
    treatment for differentiable ray tracing.
    """
    import jax
    import jax.numpy as jnp

    @jax.custom_vjp
    def f(x):
        return jnp.sqrt(x)

    def fwd(x):
        y = jnp.sqrt(x)
        return y, y

    def bwd(y, g):
        grad = jnp.minimum(0.5 / jnp.maximum(y, 1e-30), _SQRT_GRAD_CAP)
        return (g * grad,)

    f.defvjp(fwd, bwd)
    return f


_capped_sqrt = None


def sqrt_capped_grad(x, xp):
    """Exact sqrt; derivative clipped to avoid silhouette gradient blowup."""
    global _capped_sqrt
    if xp is np:
        return np.sqrt(x)
    if _capped_sqrt is None:
        _capped_sqrt = _make_capped_sqrt()
    return _capped_sqrt(x)


def dot(a, b, keepdims: bool = True):
    return (a * b).sum(-1, keepdims=keepdims)


def norm(v, xp):
    return xp.sqrt(dot(v, v))


def normalize(v, xp):
    return v / norm(v, xp)


def reflect(v, n):
    """v - 2 (v.n) n   (math.rs:47-49)."""
    return v - 2.0 * dot(v, n) * n


def refract(uv, n, etai_over_etat, xp):
    """Snell refraction (math.rs:51-56).  ``uv`` must be unit length.

    ``etai_over_etat`` broadcasts against ``uv[..., :1]``.
    """
    cos_theta = xp.minimum(dot(-uv, n), 1.0)
    r_out_perp = etai_over_etat * (uv + cos_theta * n)
    # max vs tiny: sqrt'(0) = inf would NaN gradients of masked TIR lanes;
    # primal change is at most 1e-6 exactly at grazing incidence.
    r_out_parallel = (
        -xp.sqrt(xp.maximum(xp.abs(1.0 - dot(r_out_perp, r_out_perp)),
                            1e-12)) * n
    )
    return r_out_perp + r_out_parallel


def reflectance(cosine, refraction_index):
    """Schlick approximation (math.rs:58-62)."""
    r0 = (1.0 - refraction_index) / (1.0 + refraction_index)
    r0 = r0 * r0
    one_minus = 1.0 - cosine
    return r0 + (1.0 - r0) * one_minus * one_minus * one_minus * one_minus * one_minus


NEAR_ZERO_EPS = 1e-8


def near_zero(v, xp):
    """True where every component's |.| < 1e-8 (math.rs:42-45)."""
    return xp.all(xp.abs(v) < NEAR_ZERO_EPS, axis=-1, keepdims=True)


def unit_vector_from_uniforms(u1, u2, xp):
    """Uniform direction on the unit sphere from two uniforms in [0,1).

    Same distribution as the reference's ``random_unit_vector``
    (normalise(uniform-in-ball), math.rs:12-14).
    """
    z = 1.0 - 2.0 * u1
    r = xp.sqrt(xp.maximum(0.0, 1.0 - z * z))
    phi = np.float32(2.0 * np.pi) * u2
    return xp.stack([r * xp.cos(phi), r * xp.sin(phi), z], axis=-1)


def in_unit_sphere_from_uniforms(u1, u2, u3, xp):
    """Uniform point in the unit ball from three uniforms.

    Same distribution as ``random_in_unit_sphere`` (math.rs:16-30): a uniform
    direction scaled by radius ~ u^(1/3).
    """
    direction = unit_vector_from_uniforms(u1, u2, xp)
    radius = xp.cbrt(u3) if hasattr(xp, "cbrt") else u3 ** (1.0 / 3.0)
    return direction * radius[..., None]


def in_unit_disk_from_uniforms(u1, u2, xp):
    """Uniform point in the unit disk (z=0) from two uniforms.

    Same distribution as ``random_in_unit_disk`` (math.rs:32-40).
    Returns (..., 2).
    """
    r = xp.sqrt(u1)
    phi = np.float32(2.0 * np.pi) * u2
    return xp.stack([r * xp.cos(phi), r * xp.sin(phi)], axis=-1)
