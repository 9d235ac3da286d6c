"""Worker for tests/test_multihost.py: one process of a 2-process CPU
"pod" (gloo collectives), 2 local devices each -> a 4-device global
(rays x spp) mesh.  Renders a sample-sharded block through the GSPMD
renderer and assembles the full image with gather_image's
process_allgather path — the cross-process analogue of the reference's
mpsc tile funnel (application.rs:213,284-306).

Usage: python tests/multihost_worker.py PID NPROC PORT OUT.npy
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np

    from hyper_ray_tracer_tpu import build_scene
    from hyper_ray_tracer_tpu.camera import make_basis
    from hyper_ray_tracer_tpu.parallel.mesh import (
        make_render_mesh,
        maybe_init_distributed,
    )
    from hyper_ray_tracer_tpu.parallel.render_sharded import (
        gather_image,
        make_pjit_renderer,
    )
    from hyper_ray_tracer_tpu.render import prepare_scene

    # Already initialised above (explicit args for the test harness);
    # assert the library hook agrees on the topology.
    assert (jax.process_index(), jax.process_count()) == (pid, nproc)
    assert len(jax.devices()) == 4  # 2 local x 2 processes

    W, H, SPP, DEPTH = 32, 16, 4, 4
    scene = build_scene("three-spheres")
    arrays, bvh, intersector = prepare_scene(scene)
    basis = make_basis(scene.camera, W, H)
    mesh = make_render_mesh(2, 2)

    run = make_pjit_renderer(scene, W, H, DEPTH, mesh, intersector)
    rad = run(arrays, bvh, basis, 0, SPP, 0)
    img = gather_image(rad, SPP, W, H)
    np.save(out, img)

    # Also drive the sharded COMPACTING renderer cross-process: probe
    # pass, then the scheduled descent; its _to_host all-gathers the
    # rays-sharded sum so every host returns the full array.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as SP

    from hyper_ray_tracer_tpu.parallel.mesh import AXIS_RAYS, AXIS_SPP
    from hyper_ray_tracer_tpu.parallel.render_sharded import (
        make_sharded_compacting_renderer,
    )

    idsh = NamedSharding(mesh, SP(AXIS_SPP, AXIS_RAYS))
    pix = jax.device_put(
        jnp.broadcast_to(jnp.arange(W * H, dtype=jnp.int32),
                         (SPP, W * H)), idsh)
    sam = jax.device_put(
        jnp.broadcast_to(jnp.arange(SPP, dtype=jnp.int32)[:, None],
                         (SPP, W * H)), idsh)
    crun = make_sharded_compacting_renderer(scene, W, H, DEPTH, mesh,
                                            intersector)
    probe = crun(arrays, bvh, basis, pix, sam, np.uint32(0))
    sched = crun(arrays, bvh, basis, pix, sam, np.uint32(0))
    np.testing.assert_array_equal(probe, sched)  # no partition groups
    np.save(out.replace(".npy", "_compact.npy"), probe)
    print(f"worker {pid}: wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
