"""Wavefront path-tracing integrator.

The reference integrator is a per-pixel recursion
(`/root/reference/src/application.rs:477-495`):

    ray_color(ray, depth) =
        depth == 0            -> black
        miss                  -> background
        scatter() == None     -> emitted
        else                  -> emitted + attenuation * ray_color(scattered)

Here the recursion becomes a ``lax.scan`` over ``depth`` bounces carrying the
whole ray wavefront (origin, direction, shutter time, throughput, accumulated
radiance, alive mask).  Termination is mask-out, not early exit; the algebra

    radiance += throughput * (miss ? background : emitted)
    throughput *= attenuation            (only while scattering continues)

telescopes to exactly the reference recursion.

Rays are generated from counter-based RNG streams keyed by
(seed, pixel, sample), so images are bit-identical across runs, shardings and
device counts, and the whole function is differentiable w.r.t. every scene
array (geometry, material, and texture parameters).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .camera import get_rays, make_basis
from .models.bvh_build import build_bvh
from .models.scene import Scene
from .ops import rng as prng
from .ops.bvh import make_intersector
from .ops.intersect import (
    BIG,
    gather_prim,
    make_hit_detailer,
    make_prim_intersector,
)
from .ops.materials import shade

T_MIN = np.float32(1.0e-3)  # application.rs:482

# Gradient sky (BASELINE configs 1-2; the book's sky, not in the reference,
# which uses a flat per-scene background color, application.rs:482-484).
_SKY_WHITE = np.float32([1.0, 1.0, 1.0])
_SKY_BLUE = np.float32([0.5, 0.7, 1.0])

# Scenes smaller than this are faster with the dense tiled all-pairs sweep
# than with gather-based BVH traversal on a vector machine.  Measured on TPU
# v5e: the tiled sweep beats the BVH by ~77x even on the *largest* reference
# scene (final, 3.4k prims, 67 ms vs 5.1 s per 90k-ray wavefront) because
# per-ray divergent node cursors force [N]-gathers every traversal step.
# The BVH (use_bvh=True) remains for asymptotically large scenes, where the
# O(P) sweep must eventually lose to O(log P) traversal.
AUTO_BVH_MIN_PRIMS = 100_000


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    width: int
    height: int
    samples: int
    depth: int
    seed: int = 0
    spp_chunk: Optional[int] = None  # samples per device pass
    use_bvh: Optional[bool] = None  # None = auto by scene size
    leaf_size: int = 4
    # Resumable rendering (SURVEY.md §5): persist the radiance accumulator
    # after every chunk; a resumed render is bit-identical to an
    # uninterrupted one (counter-based RNG).
    checkpoint_path: Optional[str] = None
    # Progressive preview PNG updated after every chunk (replaces the
    # reference's incremental GL tile display).
    preview_path: Optional[str] = None


def make_ray_colorer(scene: Scene, width: int, height: int, depth: int,
                     use_bvh: bool, leaf_size: int = 4,
                     remat: bool = False):
    """Build the jittable wavefront kernel.

    Returns f(arrays, bvh, basis, pixel_ids, sample_ids, seed) -> [N,3]
    radiance (pre-gamma, pre-averaging).  ``arrays.geom`` must already be in
    BVH leaf order when ``use_bvh``.

    ``remat=True`` rematerialises each bounce in the backward pass
    (jax.checkpoint over the scan body): deep differentiable renders
    (depth 50) trade recompute for O(depth) -> O(1) shading residuals —
    SURVEY.md §7 'memory for deep transport'.
    """
    static = scene.static
    background = scene.background
    # Scan path: primitives keep the scene build order, so the host-side
    # arrays drive per-tile type specialisation of the dense sweep.
    trace = make_intersector(
        static, use_bvh=use_bvh, leaf_size=leaf_size,
        host_geom=None if use_bvh else scene.arrays.geom)
    prim_hit_t = make_prim_intersector(static)
    detail_fn = make_hit_detailer(static)
    w_minus_1 = np.float32(width - 1)
    h_minus_1 = np.float32(height - 1)

    def ray_color(arrays, bvh, basis, pixel_ids, sample_ids, seed):
        geom = arrays.geom
        base = prng.ray_base(
            seed,
            pixel_ids.astype(jnp.uint32),
            sample_ids.astype(jnp.uint32),
        )
        x = (pixel_ids % width).astype(jnp.float32)
        y = (pixel_ids // width).astype(jnp.float32)  # row from the BOTTOM
        ju = prng.uniform(base, prng.P_CAM_JITTER_U)
        jv = prng.uniform(base, prng.P_CAM_JITTER_V)
        s = (x + ju) / w_minus_1  # application.rs:443-446
        t = (y + jv) / h_minus_1
        o, d, time = get_rays(basis, base, s, t, jnp)

        # Carries derived from ray data (not fresh constants) so they are
        # device-varying under shard_map.
        zero3 = o * 0.0
        init = (
            o,
            d,
            zero3[:, 0] + 1.0 > 0.0,  # alive: all True
            zero3 + 1.0,  # throughput
            zero3,  # radiance
        )

        def bounce(carry, bounce_idx):
            o, d, alive, throughput, radiance = carry
            bb = prng.bounce_base(base, bounce_idx)

            # Traversal is a discrete search: stop gradients through it and
            # differentiably *recompute* the winner's hit distance below.
            # This keeps the whole bounce reverse-mode differentiable (the
            # BVH while_loop has no VJP) and shrinks backward residuals from
            # O(P) per bounce to O(1).
            t_hit, prim = trace(
                geom, bvh, jax.lax.stop_gradient(o),
                jax.lax.stop_gradient(d), time, T_MIN, bb, alive,
            )
            t_hit = jax.lax.stop_gradient(t_hit)
            hit = prim >= 0

            if background is None:  # gradient sky
                unit_y = d[:, 1] / jnp.sqrt((d * d).sum(-1))
                sky_t = (0.5 * (unit_y + 1.0))[:, None]
                bg = (1.0 - sky_t) * _SKY_WHITE + sky_t * _SKY_BLUE
            else:
                bg = jnp.asarray(background, jnp.float32)
            miss = alive & ~hit
            radiance = radiance + jnp.where(
                miss[:, None], throughput * bg, 0.0
            )

            pidx = jnp.maximum(prim, 0)
            pf = gather_prim(geom, pidx)
            # Differentiable recompute of the winning hit distance: for the
            # winner the same closed form evaluates to the traversal's t
            # (media free-flight t does not depend on t_max; spheres always
            # resolve to the same root), but now with gradients to geometry.
            t_re = prim_hit_t(pf, o, d, time, T_MIN, jnp.float32(BIG), bb,
                              jnp)
            # Miss lanes get a dummy finite t: with t = BIG the hit point
            # overflows to inf and inf/NaN primals on masked lanes corrupt
            # gradients of live lanes (0-cotangent * inf = NaN in VJPs).
            # Grazing hits can recompute to a miss (the discriminant lands on
            # the other side of 0 under different op fusion); fall back to
            # the traversal's t there — gradient-free, but it is a
            # decision-boundary lane anyway.
            re_ok = t_re < jnp.float32(0.5) * BIG
            t_use = jnp.where(hit, jnp.where(re_ok, t_re, t_hit), 1.0)
            det = detail_fn(pf, o, d, time, t_use, jnp)
            mat_idx = geom.material[pidx]
            sc = shade(arrays, mat_idx, det, d, bb, static, jnp)

            contrib = alive & hit
            radiance = radiance + jnp.where(
                contrib[:, None], throughput * sc.emitted, 0.0
            )
            alive = contrib & sc.did_scatter
            throughput = jnp.where(
                alive[:, None], throughput * sc.attenuation, throughput
            )
            o = jnp.where(alive[:, None], det.point, o)
            d = jnp.where(alive[:, None], sc.direction, d)
            return (o, d, alive, throughput, radiance), None

        bounce_fn = jax.checkpoint(bounce) if remat else bounce
        (o, d, alive, throughput, radiance), _ = jax.lax.scan(
            bounce_fn, init, jnp.arange(depth, dtype=jnp.uint32)
        )
        return radiance

    return ray_color


def prepare_scene(scene: Scene, use_bvh: Optional[bool] = None,
                  leaf_size: int = 4):
    """Resolve the BVH decision and produce device-ready arrays.

    Returns (arrays, bvh_arrays_or_dummy, use_bvh).
    """
    if use_bvh is None:
        use_bvh = scene.static.n_prims >= AUTO_BVH_MIN_PRIMS
    arrays = scene.arrays
    if use_bvh:
        bvh, geom = build_bvh(arrays.geom, leaf_size=leaf_size)
        arrays = arrays._replace(geom=geom)
    else:
        from .models.bvh_build import BVHArrays

        bvh = BVHArrays(
            bounds_min=np.zeros((1, 3), np.float32),
            bounds_max=np.zeros((1, 3), np.float32),
            leaf_first=np.zeros(1, np.int32),
            leaf_count=np.zeros(1, np.int32),
            skip=np.ones(1, np.int32),
        )
    return arrays, bvh, use_bvh


def _gamma_image(acc: np.ndarray, samples: int, W: int, H: int) -> np.ndarray:
    """sqrt-gamma (application.rs:451-453), bottom-up rows -> top-down."""
    img = np.sqrt(np.maximum(acc / samples, 0.0)).astype(np.float32)
    return img.reshape(H, W, 3)[::-1]


def render_image(scene: Scene, settings: RenderSettings,
                 progress_cb=None) -> np.ndarray:
    """Render a full image; returns [H, W, 3] float32, gamma-corrected
    (sqrt, application.rs:451-453), rows top-down."""
    import time as _time

    from .utils import checkpoint as ckpt
    from .utils.logging import get as get_logger

    log = get_logger()
    W, H = settings.width, settings.height
    arrays, bvh, use_bvh = prepare_scene(
        scene, settings.use_bvh, settings.leaf_size
    )
    basis = make_basis(scene.camera, W, H)
    ray_color = make_ray_colorer(
        scene, W, H, settings.depth, use_bvh, settings.leaf_size
    )

    spp_chunk = settings.spp_chunk or _auto_spp_chunk(
        W, H, settings.samples, settings.depth)

    def _render_chunk(arrays, bvh, basis, sample0, n_samples_static, seed):
        pix = jnp.arange(W * H, dtype=jnp.int32)
        pixel_ids = jnp.tile(pix, n_samples_static)
        sample_ids = jnp.repeat(
            sample0 + jnp.arange(n_samples_static, dtype=jnp.int32), W * H
        )
        rad = ray_color(arrays, bvh, basis, pixel_ids, sample_ids, seed)
        return rad.reshape(n_samples_static, W * H, 3).sum(0)

    render_chunk = jax.jit(_render_chunk, static_argnums=(4,))

    meta = dict(scene=scene.name, width=W, height=H,
                samples=settings.samples, depth=settings.depth,
                seed=settings.seed)
    acc = np.zeros((W * H, 3), np.float64)
    s = 0
    if settings.checkpoint_path:
        state = ckpt.load_state(settings.checkpoint_path)
        if state is not None:
            c_acc, c_done, c_meta = state
            if ckpt.meta_matches(c_meta, meta) and c_acc.shape == acc.shape:
                acc, s = c_acc.astype(np.float64), c_done
                log.info("resumed render at %d/%d spp from %s",
                         s, settings.samples, settings.checkpoint_path)
            else:
                log.warning("checkpoint %s does not match render config; "
                            "starting fresh", settings.checkpoint_path)

    seed = np.uint32(settings.seed)
    t_start = _time.monotonic()
    rays_done = 0
    while s < settings.samples:
        ns = min(spp_chunk, settings.samples - s)
        acc += np.asarray(
            render_chunk(arrays, bvh, basis, np.int32(s), int(ns), seed)
        )
        s += ns
        rays_done += ns * W * H
        if settings.checkpoint_path:
            ckpt.save_state(settings.checkpoint_path, acc, s, meta)
        if settings.preview_path:
            from .utils.image import write_png

            write_png(settings.preview_path,
                      _gamma_image(acc, s, W, H))
        if progress_cb is not None:
            progress_cb(s, settings.samples)

    dt = _time.monotonic() - t_start
    if rays_done and dt > 0:
        log.debug("rendered %d camera rays in %.2fs (%.2f Mrays/s, "
                  "depth<=%d)", rays_done, dt, rays_done / dt / 1e6,
                  settings.depth)
    return _gamma_image(acc, settings.samples, W, H)


def _auto_spp_chunk(width: int, height: int, samples: int,
                    depth: int = 10,
                    budget_ray_bounces: int = 8_000_000) -> int:
    """Samples per dispatch, budgeted in ray-bounces.

    Sized so one dispatch stays a few seconds even on the largest scene
    (~0.7 us per ray-bounce measured on TPU v5e for the final scene): the
    tunneled device kills dispatches that run for on the order of a minute,
    and shorter dispatches also give finer checkpoint/preview granularity.
    """
    per_chunk = width * height * max(depth, 1)
    return max(1, min(samples, budget_ray_bounces // max(per_chunk, 1)))
