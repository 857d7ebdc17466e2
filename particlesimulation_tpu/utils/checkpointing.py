"""State checkpoint/resume.

The reference has none (state lives in memory for the whole run; SURVEY §5).
Here states serialize to ``.npz`` — enough to resume a run exactly (the step
function is pure, so a restored state continues bit-identically) and the
backbone of the step-diff debugging workflow in :mod:`.debug`.

Both state families round-trip: single-chip :class:`SimState` and the
mesh-parallel :class:`ShardedState` (the extra ``valid`` mask plus the
per-shard slab geometry distinguishes them; the shard count is recorded so
a restore onto a different mesh width is re-packed rather than corrupted).
"""

from __future__ import annotations

import numpy as np

from particlesimulation_tpu.state import ShardedState, SimState

_FIELDS = ("x", "y", "vx", "vy", "m", "alive", "pid", "collisions", "panics",
           "overflow")
_SHARDED_FIELDS = _FIELDS + ("valid",)


def save_state(path: str, state) -> None:
    """Serialize a SimState or ShardedState (detected by the valid mask)."""
    fields = _SHARDED_FIELDS if isinstance(state, ShardedState) else _FIELDS
    np.savez_compressed(path, **{f: np.asarray(getattr(state, f))
                                 for f in fields})


def save_sharded_state(path: str, state: ShardedState,
                       n_shards: int, row_starts: tuple = (),
                       mesh_shape: tuple = (), band_plan: tuple = ()) -> None:
    """Serialize a ShardedState with its slab geometry.

    ``n_shards`` (plus ``row_starts`` when the decomposition is
    census-weighted, parallel/balance.py; ``mesh_shape`` when the state
    came from the 2D rectangular engine, parallel/sharded2d.py; or
    ``band_plan`` when it came from the block-cyclic banded engine,
    parallel/sharded_banded.py) are recorded so :func:`restore_sharded`
    can re-pack the flat (D*C,) slabs for a different mesh geometry or
    capacity — slab placement encodes cell ownership, so as-is placement
    is only legal when everything matches.
    """
    arrs = {f: np.asarray(getattr(state, f)) for f in _SHARDED_FIELDS}
    arrs["n_shards"] = np.asarray(n_shards, np.int32)
    arrs["row_starts"] = np.asarray(row_starts, np.int32)
    arrs["mesh_shape"] = np.asarray(mesh_shape, np.int32)
    arrs["band_plan"] = np.asarray(
        [list(p) for p in band_plan] if band_plan else
        np.zeros((0, 3)), np.int32)
    np.savez_compressed(path, **arrs)


def load_state(path: str, dtype=None):
    """Restore a state saved by save_state / save_sharded_state.

    Returns a SimState or ShardedState matching what was saved (host
    arrays; sharded slabs are NOT re-placed on a mesh — use
    :func:`restore_sharded` through an engine for that).
    """
    import jax.numpy as jnp

    z = np.load(path)

    def arr(f, dt=None):
        a = z[f]
        return jnp.asarray(a if dt is None else a.astype(dt))

    dt = dtype
    common = dict(
        x=arr("x", dt), y=arr("y", dt), vx=arr("vx", dt), vy=arr("vy", dt),
        m=arr("m", dt), alive=arr("alive"), pid=arr("pid"),
        collisions=arr("collisions"), panics=arr("panics"),
        overflow=arr("overflow"))
    if "valid" in z.files:
        return ShardedState(valid=arr("valid"), **common)
    return SimState(**common)


def restore_sharded(path: str, engine, dtype=None) -> ShardedState:
    """Load a sharded checkpoint and place it on ``engine``'s mesh.

    Handles capacity/mesh-width changes by gathering the valid particles
    and re-scattering them through the engine's own slab packer: the
    result is a legal input for ``engine.run`` regardless of how the
    checkpoint's slabs were laid out. When the geometry matches exactly
    the slabs are placed as-is (bit-exact resume).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    z = np.load(path)
    d = engine.config.n_shards
    saved_shards = int(z["n_shards"]) if "n_shards" in z.files else None
    saved_starts = (tuple(int(r) for r in z["row_starts"])
                    if "row_starts" in z.files else ())
    saved_mesh = (tuple(int(v) for v in z["mesh_shape"])
                  if "mesh_shape" in z.files else ())
    saved_plan = (tuple(tuple(int(v) for v in p) for p in z["band_plan"])
                  if "band_plan" in z.files and len(z["band_plan"])
                  else ())
    total = z["x"].shape[0]
    cap = engine.capacity or engine.config.resolved_shard_capacity()
    # The 2D rectangular engine (parallel/sharded2d.py) shards over both
    # mesh axes; the 1D engine over its single "rows" axis.
    engine_mesh = tuple(getattr(engine.config, "mesh_shape", ()) or ())
    if engine_mesh:
        from particlesimulation_tpu.parallel.sharded2d import BOTH as _SPEC
    else:
        from particlesimulation_tpu.parallel.sharded import AXIS as _SPEC
    sh = NamedSharding(engine.mesh, P(_SPEC))
    rep = NamedSharding(engine.mesh, P())
    dt = dtype or engine.dtype

    # Slab placement encodes cell ownership: as-is placement needs the
    # same decomposition too (row boundaries for the 1D engine, the
    # (rows, cols) aspect for the 2D one), else a checkpoint restored
    # under different boundaries puts particles on the wrong shard (the
    # prologue would flag them as strays).
    # The banded engines own cells by their decomposition variant, not
    # by row blocks — column split for the "cols" variant
    # (parallel/sharded_banded_cols.py, signature ((-1,-1,-1),)), the
    # band plan itself for block-cyclic (parallel/sharded_banded.py).
    # A banded checkpoint into a non-banded engine (or signature
    # mismatch) must re-pack.
    if hasattr(engine, "ownership_plan"):
        engine_plan = tuple(tuple(int(v) for v in p)
                            for p in engine.ownership_plan())
    else:
        engine_plan = (tuple(tuple(int(v) for v in p)
                             for p in (getattr(engine, "_band_plan", None)
                                       or ()))
                       if getattr(engine, "impl", None) == "banded"
                       else ())
    if (saved_shards == d and total == d * cap
            and saved_starts == tuple(getattr(engine.config, "row_starts",
                                              ()) or ())
            and saved_mesh == engine_mesh
            and saved_plan == engine_plan):
        def place(f, cast=None):
            a = z[f]
            return jax.device_put(
                jnp.asarray(a if cast is None else a.astype(cast)), sh)

        return ShardedState(
            x=place("x", dt), y=place("y", dt),
            vx=place("vx", dt), vy=place("vy", dt), m=place("m", dt),
            alive=place("alive"), valid=place("valid"), pid=place("pid"),
            collisions=jax.device_put(jnp.asarray(z["collisions"]), rep),
            panics=jax.device_put(jnp.asarray(z["panics"]), rep),
            overflow=jax.device_put(jnp.asarray(z["overflow"]), rep))

    # Geometry changed: gather valid particles, re-pack by owner row-block.
    valid = z["valid"]
    particles = {f: z[f][valid] for f in ("x", "y", "vx", "vy", "m",
                                          "alive", "pid")}
    return engine.pack_particles(
        particles, collisions=z["collisions"], panics=z["panics"],
        dtype=dt)
