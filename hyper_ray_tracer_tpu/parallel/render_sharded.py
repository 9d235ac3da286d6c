"""Sharded rendering and distributed gradients.

Two complementary strategies (SURVEY.md §2.6 "TPU-native mapping"):

* ``make_pjit_renderer`` — GSPMD auto-partitioning: ray ids are sharded over
  the ``rays`` mesh axis, scene arrays are replicated, and XLA partitions the
  whole wavefront (every per-ray op is elementwise over the sharded axis;
  gathers read replicated tables, so no resharding is ever needed).  This is
  the zero-communication fast path — the only collective in the backward
  pass is the psum of scene-parameter gradients that autodiff inserts.

* ``make_shardmap_renderer`` — explicit `shard_map` with the sample (spp)
  axis sharded too: devices on the ``spp`` axis render disjoint sample
  subsets of the same pixels and ``psum`` their radiance sums over ICI
  (the domain's sequence-parallel analogue).

Both produce per-pixel radiance *sums* over the sample block, bit-identical
to the single-device renderer (counter-based RNG keys depend only on
(pixel, sample), never on device placement).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from ..render import make_ray_colorer
from .mesh import AXIS_RAYS, AXIS_SPP


def _ids_for_block(W, H, sample0, n_samples):
    """pixel_ids [S, W*H], sample_ids [S, W*H] for a sample block."""
    pix = jnp.arange(W * H, dtype=jnp.int32)
    pixel_ids = jnp.broadcast_to(pix, (n_samples, W * H))
    sample_ids = jnp.broadcast_to(
        (sample0 + jnp.arange(n_samples, dtype=jnp.int32))[:, None],
        (n_samples, W * H),
    )
    return pixel_ids, sample_ids


def make_pjit_renderer(scene, W, H, depth, mesh, use_bvh, leaf_size=4,
                       differentiable=False):
    """GSPMD path: returns render(arrays, bvh, basis, sample0, seed) ->
    [W*H, 3] radiance sum over ``n_samples`` samples.

    ``n_samples`` is fixed at build time (static shape); ray ids are laid
    out [S, W*H] and sharded (spp, rays).
    """
    ray_color = make_ray_colorer(scene, W, H, depth, use_bvh, leaf_size,
                                 differentiable=differentiable)
    id_sharding = NamedSharding(mesh, P(AXIS_SPP, AXIS_RAYS))
    out_sharding = NamedSharding(mesh, P(AXIS_RAYS))

    def render(arrays, bvh, basis, pixel_ids, sample_ids, seed):
        s_blk, n_pix = pixel_ids.shape
        rad = ray_color(arrays, bvh, basis, pixel_ids.reshape(-1),
                        sample_ids.reshape(-1), seed)
        return rad.reshape(s_blk, n_pix, 3).sum(0)

    render_jit = jax.jit(render, out_shardings=out_sharding)

    def run(arrays, bvh, basis, sample0, n_samples, seed):
        pixel_ids, sample_ids = _ids_for_block(W, H, sample0, n_samples)
        pixel_ids = jax.device_put(pixel_ids, id_sharding)
        sample_ids = jax.device_put(sample_ids, id_sharding)
        return render_jit(arrays, bvh, basis, pixel_ids, sample_ids,
                          np.uint32(seed))

    return run


def make_shardmap_renderer(scene, W, H, depth, mesh, use_bvh, leaf_size=4,
                           differentiable=False):
    """Explicit shard_map path with spp-axis psum.

    Returns render(arrays, bvh, basis, pixel_ids, sample_ids, seed) ->
    [W*H, 3] radiance sum; pixel/sample ids are [S, W*H] and must be
    divisible by the mesh axes.
    """
    ray_color = make_ray_colorer(scene, W, H, depth, use_bvh, leaf_size,
                                 differentiable=differentiable)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS_SPP, AXIS_RAYS),
                  P(AXIS_SPP, AXIS_RAYS), P()),
        out_specs=P(AXIS_RAYS),
    )
    def render_block(arrays, bvh, basis, pixel_ids, sample_ids, seed):
        s_loc, n_loc = pixel_ids.shape
        rad = ray_color(arrays, bvh, basis, pixel_ids.reshape(-1),
                        sample_ids.reshape(-1), seed)
        rad = rad.reshape(s_loc, n_loc, 3).sum(0)
        # Sample-parallel partial sums -> one psum over ICI.
        return jax.lax.psum(rad, AXIS_SPP)

    return jax.jit(render_block)


def gather_image(radiance_sum, samples: int, W: int, H: int) -> np.ndarray:
    """Device-sharded radiance sum -> host image (gamma, top-down rows).

    Under multi-host, fully-addressable output is fetched per-process;
    `jax.experimental.multihost_utils.process_allgather` would be used for
    cross-host assembly (single-host here: plain device_get).
    """
    acc = np.asarray(jax.device_get(radiance_sum)).astype(np.float64)
    img = np.sqrt(np.maximum(acc / samples, 0.0)).astype(np.float32)
    return img.reshape(H, W, 3)[::-1]
