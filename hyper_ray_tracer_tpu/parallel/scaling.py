"""Scaling-efficiency harness (BASELINE.md: >=80% rays/s going 1 -> N).

Renders the same sample block on meshes of increasing size and reports
throughput + efficiency vs the single-device run.  On a pod slice this
measures real ICI scaling.

Under ``--xla_force_host_platform_device_count`` the harness only
validates the *mechanism* (sharded renders execute and match): the virtual
devices share one physical host, so the efficiency column is meaningless
there (measured ~40%/11%/3% at 2/4/8 virtual devices — that is host
contention, not ICI).  Real scaling numbers require real chips; the render
is embarrassingly parallel over rays (zero per-bounce communication, one
[W*H,3] psum per sample block), so ICI efficiency is expected to be
bounded by the final psum + any load imbalance, not by the render loop.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import jax
import numpy as np

from ..camera import make_basis
from ..models.scene import Scene
from ..render import prepare_scene
from .mesh import make_render_mesh
from .render_sharded import make_pjit_renderer


@dataclasses.dataclass
class ScalingPoint:
    n_devices: int
    seconds: float
    mrays_per_s: float
    efficiency: float  # vs n_devices=1, per-device


def measure_scaling(scene: Scene, width: int, height: int, depth: int,
                    spp: int, device_counts: Optional[Sequence[int]] = None,
                    reps: int = 3, seed: int = 0) -> List[ScalingPoint]:
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]

    arrays, bvh, intersector = prepare_scene(scene)
    basis = make_basis(scene.camera, width, height)
    n_rays = width * height * spp

    points: List[ScalingPoint] = []
    base_mrays = None
    for n in device_counts:
        mesh = make_render_mesh(n, 1, devices=jax.devices()[:n])
        run = make_pjit_renderer(scene, width, height, depth, mesh, intersector)
        out = run(arrays, bvh, basis, np.int32(0), spp, seed)
        jax.block_until_ready(out)  # warmup/compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(arrays, bvh, basis, np.int32(0), spp, seed)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        mrays = n_rays / best / 1e6
        if base_mrays is None:
            base_mrays = mrays
        eff = mrays / (base_mrays * n)
        points.append(ScalingPoint(n, best, mrays, eff))
    return points
