"""Prototype: measure cluster-sweep machinery cost on the real TPU.

Question: does a lax.scan over ray-tiles, each running a dynamic-trip
lax.while_loop whose primitive tiles come from dynamic_slice, reach the
same VPU throughput as the current statically-unrolled dense sweep?  If
yes, tile-level cluster culling wins by the culled-pair ratio.

Variants (same sphere intersection math, same total pairs at k=27):
  A  unrolled static sweep: 27 tiles x 128 prims, broadcast over all rays
  B  scan over ray-tiles of L, fori_loop over k clusters via dynamic_slice
  C  B + while_loop with per-tile dynamic trip counts + mask/argsort cost

Run from /root/repo (axon plugin).  First transfer may take minutes.
"""

import sys
import time

import numpy as np

N = 1_441_792  # 1.44M rays, multiple of 2048
P_TILE = 128
N_CLUSTERS = 27
L = 2048
T = N // L

import jax
import jax.numpy as jnp


def make_data(seed=0):
    r = np.random.default_rng(seed)
    o = r.normal(size=(N, 3)).astype(np.float32)
    d = r.normal(size=(N, 3)).astype(np.float32)
    c = (r.normal(size=(N_CLUSTERS * P_TILE, 3)) * 10).astype(np.float32)
    rad = r.uniform(0.5, 2.0, size=(N_CLUSTERS * P_TILE,)).astype(np.float32)
    return jax.device_put((o, d, c, rad))


def sphere_sweep(o, d, c, rad, t_best):
    # o,d: [L,3]; c,rad: [P,3],[P] -> per-pair t  (roughly sphere_t's ops)
    oc = o[:, None, :] - c[None, :, :]
    a = (d * d).sum(-1)[:, None]
    half_b = (oc * d[:, None, :]).sum(-1)
    cc = (oc * oc).sum(-1) - (rad * rad)[None, :]
    disc = half_b * half_b - a * cc
    ok = disc > 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t1 = (-half_b - sq) / a
    t2 = (-half_b + sq) / a
    t1ok = ok & (t1 > 1e-3) & (t1 < t_best[:, None])
    t2ok = ok & (t2 > 1e-3) & (t2 < t_best[:, None])
    t = jnp.where(t1ok, t1, jnp.where(t2ok, t2, 1e30))
    j = jnp.argmin(t, axis=1)
    tt = jnp.min(t, axis=1)
    return jnp.minimum(t_best, tt), j


@jax.jit
def variant_a(o, d, c, rad):
    t_best = jnp.full((N,), 1e30, jnp.float32)

    def body(i, carry):
        t_best, best = carry
        cs = jax.lax.dynamic_slice_in_dim(c, i * P_TILE, P_TILE, 0)
        rs = jax.lax.dynamic_slice_in_dim(rad, i * P_TILE, P_TILE, 0)
        t_new, j = sphere_sweep(o, d, cs, rs, t_best)
        upd = t_new < t_best
        return t_new, jnp.where(upd, i * P_TILE + j.astype(jnp.int32), best)

    t_best, best = jax.lax.fori_loop(
        0, N_CLUSTERS, body, (t_best, jnp.full((N,), -1, jnp.int32)))
    return t_best.sum() + best.sum()


def make_variant_b(k_clusters):
    @jax.jit
    def variant_b(o, d, c, rad):
        o_t = o.reshape(T, L, 3)
        d_t = d.reshape(T, L, 3)

        def tile_body(_, od):
            o_l, d_l = od
            t_best = jnp.full((L,), 1e30, jnp.float32)
            best = jnp.full((L,), -1, jnp.int32)

            def body(i, carry):
                t_best, best = carry
                cs = jax.lax.dynamic_slice_in_dim(c, i * P_TILE, P_TILE, 0)
                rs = jax.lax.dynamic_slice_in_dim(rad, i * P_TILE, P_TILE, 0)
                t_new, j = sphere_sweep(o_l, d_l, cs, rs, t_best)
                upd = t_new < t_best
                return t_new, jnp.where(
                    upd, i * P_TILE + j.astype(jnp.int32), best)

            t_best, best = jax.lax.fori_loop(0, k_clusters, body,
                                             (t_best, best))
            return None, t_best.sum() + best.sum()

        _, sums = jax.lax.scan(tile_body, None, (o_t, d_t))
        return sums.sum()

    return variant_b


def make_variant_c():
    """Full machinery: per-tile cluster mask + entry-t argsort outside the
    scan, dynamic-trip while_loop inside, random trips averaging ~8."""
    @jax.jit
    def variant_c(o, d, c, rad, counts):
        o_t = o.reshape(T, L, 3)
        d_t = d.reshape(T, L, 3)

        # Phase A stand-in: dense per-ray cluster AABB test + per-tile
        # reduce + argsort (the real culling cost).
        cmin = c.reshape(N_CLUSTERS, P_TILE, 3).min(1)
        cmax = c.reshape(N_CLUSTERS, P_TILE, 3).max(1)
        inv_d = 1.0 / d
        t0 = (cmin[None] - o[:, None]) * inv_d[:, None]
        t1 = (cmax[None] - o[:, None]) * inv_d[:, None]
        lo = jnp.minimum(t0, t1).max(-1)
        hi = jnp.maximum(t0, t1).min(-1)
        hit = hi > jnp.maximum(lo, 1e-3)  # [N, C]
        entry = jnp.where(hit, lo, jnp.inf).reshape(T, L, N_CLUSTERS)
        tile_entry = entry.min(1)  # [T, C]
        order = jnp.argsort(tile_entry, axis=1)  # [T, C]

        def tile_body(_, xs):
            o_l, d_l, cnt, lst = xs
            t_best = jnp.full((L,), 1e30, jnp.float32)
            best = jnp.full((L,), -1, jnp.int32)

            def cond(carry):
                k, _, _ = carry
                return k < cnt

            def body(carry):
                k, t_best, best = carry
                cid = lst[k]
                cs = jax.lax.dynamic_slice_in_dim(c, cid * P_TILE, P_TILE, 0)
                rs = jax.lax.dynamic_slice_in_dim(rad, cid * P_TILE,
                                                  P_TILE, 0)
                t_new, j = sphere_sweep(o_l, d_l, cs, rs, t_best)
                upd = t_new < t_best
                return (k + 1, t_new,
                        jnp.where(upd, cid * P_TILE + j.astype(jnp.int32),
                                  best))

            _, t_best, best = jax.lax.while_loop(
                cond, body, (jnp.int32(0), t_best, best))
            return None, t_best.sum() + best.sum()

        _, sums = jax.lax.scan(tile_body, None,
                               (o_t, d_t, counts, order))
        return sums.sum()

    return variant_c


def bench(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(out)  # warmup + compile + first-transfer handshake
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    o, d, c, rad = make_data()
    print("device:", jax.devices()[0], flush=True)

    tb = bench(variant_a, o, d, c, rad)
    pairs = N * N_CLUSTERS * P_TILE
    print(f"A unrolled sweep      : {tb*1e3:8.1f} ms  "
          f"{pairs/tb/1e9:6.1f} Gpairs/s", flush=True)

    for k in (27, 8):
        vb = make_variant_b(k)
        tbk = bench(vb, o, d, c, rad)
        pk = N * k * P_TILE
        print(f"B scan-tiles k={k:2d}     : {tbk*1e3:8.1f} ms  "
              f"{pk/tbk/1e9:6.1f} Gpairs/s", flush=True)

    r = np.random.default_rng(1)
    counts = jnp.asarray(r.integers(6, 11, size=(T,)).astype(np.int32))
    mean_k = float(np.asarray(counts).mean())
    vc = make_variant_c()
    tc = bench(vc, o, d, c, rad, counts)
    pk = N * mean_k * P_TILE
    print(f"C mask+while k~{mean_k:.1f}   : {tc*1e3:8.1f} ms  "
          f"{pk/tc/1e9:6.1f} Gpairs/s (incl. mask+sort)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
