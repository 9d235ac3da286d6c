"""Device mesh helpers.

The reference's only parallelism is one tokio task per image tile on OS
threads (`/root/reference/src/application.rs:404-475`).  The TPU-native
equivalent is SPMD over a `jax.sharding.Mesh`:

* axis ``rays``  — data parallelism over the flattened pixel wavefront
  (the analogue of the reference's tiles);
* axis ``spp``   — sample parallelism: devices render disjoint sample
  subsets of the *same* pixels and ``psum`` the radiance (this domain's
  sequence/ring parallelism analogue: partial accumulation + collective
  reduce).

Scene arrays, BVH, and camera are tiny and replicated; gradients of scene
parameters are psum-reduced across the whole mesh by autodiff.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_RAYS = "rays"
AXIS_SPP = "spp"


def make_render_mesh(n_rays_shards: Optional[int] = None,
                     n_spp_shards: int = 1,
                     devices: Optional[Sequence] = None) -> Mesh:
    """Build a (rays, spp) mesh.  Defaults to all devices on the rays axis.

    On a real pod slice, lay ``rays`` along the larger/faster ICI dimension;
    ``spp`` only carries one [N,3] psum per render so its placement barely
    matters.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_rays_shards is None:
        n_rays_shards = len(devices) // n_spp_shards
    n = n_rays_shards * n_spp_shards
    if n > len(devices):
        raise ValueError(
            f"mesh {n_rays_shards}x{n_spp_shards} needs {n} devices, "
            f"have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n]).reshape(n_rays_shards, n_spp_shards)
    return Mesh(dev_array, (AXIS_RAYS, AXIS_SPP))


def maybe_init_distributed() -> Tuple[int, int]:
    """Initialise multi-host JAX if launched under a multi-process runtime.

    Returns (process_index, process_count).  Single-process runs are a
    no-op.  On a pod slice this must be called before first device use;
    collectives then ride ICI within a slice and DCN across slices with no
    further code changes (jax.distributed + GSPMD).
    """
    import os

    if int(os.environ.get("HRT_NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()
