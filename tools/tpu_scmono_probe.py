"""Microbench the supercell monopole path's sub-ops on silicon.

The SMALL-shape ablation showed the monopole path at ~25 of 28.5 ms/step;
this isolates each candidate cost: COM einsums (3 precisions), stencil
tables + transposes, pack/unpack shuffles, the per-slot one-hot gather
(einsum vs take_along_axis), and the 8-term force loop.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from particlesimulation_tpu.ops import stencil


def bench(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))  # hard fence
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:45s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    nc = 1300
    S = 9
    nsc = -(-nc // S)
    rows = nsc * nsc
    K = 64
    s2 = S * S
    ncp = nsc * S
    side = 10000.0
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    mf = jax.random.uniform(ks[0], (rows, K), jnp.float32)
    x = jax.random.uniform(ks[1], (rows, K), jnp.float32) * side
    y = jax.random.uniform(ks[2], (rows, K), jnp.float32) * side
    sub = jax.random.randint(ks[3], (rows, K), 0, s2)
    M = jax.random.uniform(ks[4], (nc * nc,), jnp.float32)
    MX = jax.random.uniform(ks[5], (nc * nc,), jnp.float32) * side
    MY = jax.random.uniform(ks[6], (nc * nc,), jnp.float32) * side
    tbl_sc = jax.random.uniform(ks[7], (rows, s2, 24), jnp.float32)
    slot_t = jax.random.uniform(ks[7], (rows, K, 24), jnp.float32)

    iota = jnp.arange(s2, dtype=jnp.int32)

    def onehot_of(sub):
        return (sub[:, :, None] == iota).astype(jnp.float32)

    HI = jax.lax.Precision.HIGHEST
    H = jax.lax.Precision.HIGH
    D = jax.lax.Precision.DEFAULT

    def com3(mf, x, y, sub, prec):
        oh = onehot_of(sub)
        a = jnp.einsum("rk,rks->rs", mf, oh, precision=prec)
        b = jnp.einsum("rk,rks->rs", mf * x, oh, precision=prec)
        c = jnp.einsum("rk,rks->rs", mf * y, oh, precision=prec)
        return a, b, c

    bench("com3 einsum HIGHEST", lambda *a: com3(*a, HI), mf, x, y, sub)
    bench("com3 einsum HIGH", lambda *a: com3(*a, H), mf, x, y, sub)
    bench("com3 einsum DEFAULT", lambda *a: com3(*a, D), mf, x, y, sub)

    def com3_sum(mf, x, y, sub):
        oh = onehot_of(sub)
        a = jnp.sum(mf[:, :, None] * oh, axis=1)
        b = jnp.sum((mf * x)[:, :, None] * oh, axis=1)
        c = jnp.sum((mf * y)[:, :, None] * oh, axis=1)
        return a, b, c

    bench("com3 bcast-mul-reduce (VPU)", com3_sum, mf, x, y, sub)

    def tables(M, MX, MY):
        ml, mxl, myl = stencil.stencil_tables(M, MX, MY, side, nc)
        return (ml[:, :nc * nc].T.reshape(nc, nc, 8),
                mxl[:, :nc * nc].T.reshape(nc, nc, 8),
                myl[:, :nc * nc].T.reshape(nc, nc, 8))

    bench("stencil_tables + .T x3", tables, M, MX, MY)

    def pack(tblcat):
        pad = [(0, ncp - nc), (0, ncp - nc), (0, 0)]
        ap = jnp.pad(tblcat, pad)
        ap = ap.reshape(nsc, S, nsc, S, 24)
        ap = jnp.moveaxis(ap, 2, 1)
        return ap.reshape(rows, s2, 24)

    tblcat = jax.random.uniform(key, (nc, nc, 24), jnp.float32)
    bench("pack_grid (nc,nc,24)->(rows,s2,24)", pack, tblcat)

    def gather_einsum(sub, tbl_sc, prec):
        oh = onehot_of(sub)
        return jnp.einsum("rks,rsc->rkc", oh, tbl_sc, precision=prec)

    bench("slot_t einsum HIGHEST",
          lambda a, b: gather_einsum(a, b, HI), sub, tbl_sc)
    bench("slot_t einsum HIGH",
          lambda a, b: gather_einsum(a, b, H), sub, tbl_sc)
    bench("slot_t einsum DEFAULT",
          lambda a, b: gather_einsum(a, b, D), sub, tbl_sc)

    def gather_tak(sub, tbl_sc):
        return jnp.take_along_axis(tbl_sc, sub[:, :, None], axis=1)

    bench("slot_t take_along_axis", gather_tak, sub, tbl_sc)

    def force8(x, y, mf, slot_t):
        gm = mf * jnp.float32(6.674e-11)
        fx = jnp.zeros_like(x)
        fy = jnp.zeros_like(x)
        for l in range(8):
            cm = slot_t[:, :, l]
            dxl = slot_t[:, :, 8 + l] - x
            dyl = slot_t[:, :, 16 + l] - y
            d2l = dxl * dxl + dyl * dyl
            nzl = (d2l > 0.0) & (cm != 0.0)
            invl = jnp.where(nzl, jax.lax.rsqrt(jnp.where(nzl, d2l, 1.0)),
                             0.0)
            sl = gm * cm * (invl * invl * invl)
            fx = fx + sl * dxl
            fy = fy + sl * dyl
        return fx, fy

    bench("force 8-term loop", force8, x, y, mf, slot_t)


if __name__ == "__main__":
    main()
