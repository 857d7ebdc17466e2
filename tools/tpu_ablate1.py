"""Single-variant ablation (see tpu_ablate.py). Usage: tpu_ablate1.py <variant> [N] [ncside] [reps]"""
import sys, time
import jax, jax.numpy as jnp, numpy as np

def main():
    from particlesimulation_tpu.config import DELTAT, EPSILON, Precision, SimConfig
    from particlesimulation_tpu.engine import make_step
    from particlesimulation_tpu.ops import binning, collisions, com, forces, integrate, stencil
    from particlesimulation_tpu.ops import dense_xla
    from tools.tpu_stepbench import device_init_state

    which = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    ncside = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    cfg = SimConfig(seed=1, side=5000.0, ncside=ncside, n_particles=n, precision=Precision.FAST)
    state = device_init_state(cfg, None)
    side, nc, ncells = cfg.side, cfg.ncside, cfg.ncells
    x, y, vx, vy, m, alive, pid = (state.x, state.y, state.vx, state.vy, state.m, state.alive, state.pid)
    kcap = 256

    def fn_sort(c):
        key, _v = binning.cell_keys(x + c, y, side, nc)
        out = binning.sort_by_cell(key, pid, x, y, vx, vy, m, alive)
        return c + out[2][0] * 0

    def fn_segments(c):
        key, valid = binning.cell_keys(x + c, y, side, nc)
        pos, _ = binning.segment_positions(key)
        kmax = binning.max_occupancy(pos, valid)
        return c + kmax.astype(x.dtype) * 0

    def fn_com(c):
        key, _v = binning.cell_keys(x + c, y, side, nc)
        M, MX, MY = com.com_fast(key, x, y, m, ncells)
        ml, mxl, myl = stencil.stencil_tables(M, MX, MY, side, nc)
        return c + ml[0, 0] * 0

    def fn_forces(c):
        key, valid = binning.cell_keys(x + c, y, side, nc)
        pos, _ = binning.segment_positions(key)
        kmax = binning.max_occupancy(pos, valid)
        M, MX, MY = com.com_fast(key, x, y, m, ncells)
        ml, mxl, myl = stencil.stencil_tables(M, MX, MY, side, nc)
        fx, fy = forces.pairwise_forces_fast(x, y, m, alive, key, kmax, ncells)
        fx, fy = forces.monopole_forces(x, y, m, alive, key, fx, fy, ml, mxl, myl, ncells, False)
        return c + fx[0] * 0

    def fn_collide(c):
        key, valid = binning.cell_keys(x + c, y, side, nc)
        pos, _ = binning.segment_positions(key)
        kmax = binning.max_occupancy(pos, valid)
        count, died = collisions.detect_collisions(x, y, alive, key, pos, kmax, EPSILON, ncells)
        return c + count.astype(x.dtype) * 0

    def fn_scatter(c):
        key, valid = binning.cell_keys(x + c, y, side, nc)
        pos, _ = binning.segment_positions(key)
        ok = valid & (pos < kcap)
        idx = jnp.where(ok, key * kcap + pos, ncells * kcap)
        xd = jnp.zeros(ncells * kcap, x.dtype).at[idx].set(x, mode="drop")
        return c + xd[0] * 0

    def fn_dense_forces(c):
        key, valid = binning.cell_keys(x + c, y, side, nc)
        pos, _ = binning.segment_positions(key)
        ok = valid & (pos < kcap)
        idx = jnp.where(ok, key * kcap + pos, ncells * kcap)
        def sc(a):
            return jnp.zeros(ncells * kcap, a.dtype).at[idx].set(a, mode="drop").reshape(ncells, kcap)
        xd, yd, md = sc(x), sc(y), sc(m)
        M = jnp.sum(md, axis=1); SX = jnp.sum(md * xd, axis=1); SY = jnp.sum(md * yd, axis=1)
        safe = jnp.where(M > 0, M, 1.0); MX = jnp.where(M > 0, SX / safe, 0.0); MY = jnp.where(M > 0, SY / safe, 0.0)
        ml, mxl, myl = stencil.stencil_tables(M.astype(jnp.float32), MX.astype(jnp.float32), MY.astype(jnp.float32), side, nc)
        fxd, fyd = dense_xla.dense_pairwise_forces(xd, yd, md, ml[:, :ncells].T, mxl[:, :ncells].T, myl[:, :ncells].T, ncells, kcap)
        return c + fxd[0, 0] * 0

    def fn_dense_collide(c):
        key, valid = binning.cell_keys(x + c, y, side, nc)
        pos, _ = binning.segment_positions(key)
        ok = valid & (pos < kcap)
        idx = jnp.where(ok, key * kcap + pos, ncells * kcap)
        def sc(a):
            return jnp.zeros(ncells * kcap, a.dtype).at[idx].set(a, mode="drop").reshape(ncells, kcap)
        xd, yd, ad = sc(x), sc(y), sc(alive.astype(jnp.int32))
        cnt, ft = dense_xla.dense_collisions(xd, yd, ad, ncells, kcap, EPSILON)
        return c + cnt.astype(x.dtype) * 0

    fns = {"sort": fn_sort, "segments": fn_segments, "com": fn_com,
           "forces": fn_forces, "collide": fn_collide, "scatter": fn_scatter,
           "dense_forces": fn_dense_forces, "dense_collide": fn_dense_collide}
    fn = fns[which]

    @jax.jit
    def runk(k):
        return jax.lax.fori_loop(0, k, lambda i, cc: fn(cc), jnp.float32(0.0))

    t0 = time.time(); float(np.asarray(runk(1))); tc = time.time() - t0
    t0 = time.time(); float(np.asarray(runk(1))); t1 = time.time() - t0
    t0 = time.time(); float(np.asarray(runk(reps + 1))); tk = time.time() - t0
    print(f"{which}: {(tk - t1)/reps*1000:8.2f} ms/iter (compile {tc:.0f}s, run1 {t1*1000:.0f}ms)", flush=True)

main()
