"""Isolate the dense Pallas kernels on the TPU: compile+run tiny shapes."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from particlesimulation_tpu.ops.pallas import cell_pairs

def sync(r):
    return float(np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0]))

ncells, kcap = 64, 128
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (ncells, kcap)), jnp.float32)
y = jnp.asarray(rng.uniform(0, 1, (ncells, kcap)), jnp.float32)
m = jnp.asarray(rng.uniform(0.5, 1, (ncells, kcap)), jnp.float32)
s8 = jnp.zeros((ncells, 8), jnp.float32)
a = jnp.ones((ncells, kcap), jnp.int32)

t0 = time.time()
fx, fy = cell_pairs.dense_pairwise_forces(x, y, m, s8, s8, s8, ncells, kcap)
print(f"force kernel compile+run: {time.time()-t0:.1f}s val={sync(fx):.3e}", flush=True)
t0 = time.time()
fx, fy = cell_pairs.dense_pairwise_forces(x, y, m, s8, s8, s8, ncells, kcap)
print(f"force cached+sync: {(time.time()-t0)*1000:.1f} ms", flush=True)

t0 = time.time()
cnt, ft = cell_pairs.dense_collisions(x, y, a, ncells, kcap, 0.005)
print(f"collision kernel compile+run: {time.time()-t0:.1f}s count={int(np.asarray(cnt))}", flush=True)
t0 = time.time()
cnt, ft = cell_pairs.dense_collisions(x, y, a, ncells, kcap, 0.005)
print(f"collision cached+sync: {(time.time()-t0)*1000:.1f} ms", flush=True)
print("KERNEL PROBE DONE", flush=True)
