"""Unit tests for the ops layer against independent NumPy formulations."""

import jax.numpy as jnp
import numpy as np

from particlesimulation_tpu.ops import binning, com, stencil
from particlesimulation_tpu.ops.forces import _doubled, _shift_down, _shift_up

RNG = np.random.default_rng(0)


def _random_particles(n, side):
    x = RNG.uniform(0, side, n)
    y = RNG.uniform(0, side, n)
    m = RNG.uniform(0.5, 2.0, n)
    return x, y, m


def test_cell_keys_matches_c_truncation():
    side, nc = 7.3, 5
    x, y, _ = _random_particles(500, side)
    key, valid = binning.cell_keys(jnp.asarray(x), jnp.asarray(y), side, nc)
    w = side / nc
    exp = (y / w).astype(np.int32) * nc + (x / w).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(key), exp)
    assert bool(np.asarray(valid).all())


def test_cell_keys_sentinel_for_out_of_range():
    # Note -0.1 truncates toward zero to cell 0 — valid, exactly as the
    # C cast behaves in the reference (serial/parsim.cpp:268).
    key, valid = binning.cell_keys(
        jnp.asarray([0.5, 3.0, -1.5, -0.1]),
        jnp.asarray([0.5, 0.5, 0.5, 0.5]), 3.0, 3)
    assert int(key[1]) == 9 and int(key[2]) == 9  # sentinel ncells
    assert np.asarray(valid).tolist() == [True, False, False, True]


def test_sort_by_cell_orders_by_key_then_pid():
    key = jnp.asarray([2, 0, 2, 1, 0], dtype=jnp.int32)
    pid = jnp.asarray([4, 3, 1, 0, 2], dtype=jnp.int32)
    payload = jnp.asarray([40.0, 30.0, 10.0, 0.0, 20.0])
    k, p, v = binning.sort_by_cell(key, pid, payload)
    assert np.asarray(k).tolist() == [0, 0, 1, 2, 2]
    assert np.asarray(p).tolist() == [2, 3, 0, 1, 4]
    assert np.asarray(v).tolist() == [20.0, 30.0, 0.0, 10.0, 40.0]


def test_segment_positions():
    key = jnp.asarray([0, 0, 0, 2, 2, 5], dtype=jnp.int32)
    pos, first = binning.segment_positions(key)
    assert np.asarray(pos).tolist() == [0, 1, 2, 0, 1, 0]
    assert np.asarray(first).tolist() == [True, False, False, True, False, True]
    kmax = binning.max_occupancy(pos, key < 9)
    assert int(kmax) == 3


def test_shift_helpers():
    a = jnp.arange(6.0)
    a2 = _doubled(a)
    up = _shift_up(a2, 2, 6)
    assert np.asarray(up).tolist()[:4] == [2.0, 3.0, 4.0, 5.0]
    down = _shift_down(a2, 2, 6)
    assert np.asarray(down).tolist()[2:] == [0.0, 1.0, 2.0, 3.0]


def _com_oracle(key, x, y, m, ncells):
    """Sequential running weighted mean, replicating Cell::addParticle."""
    cm = np.zeros(ncells)
    cmx = np.zeros(ncells)
    cmy = np.zeros(ncells)
    for i in np.argsort(key, kind="stable"):
        c = key[i]
        if c >= ncells:
            continue
        if cm[c] == 0.0:
            cmx[c] = x[i]
            cmy[c] = y[i]
        else:
            cmx[c] = (cmx[c] * cm[c] + m[i] * x[i]) / (cm[c] + m[i])
            cmy[c] = (cmy[c] * cm[c] + m[i] * y[i]) / (cm[c] + m[i])
        cm[c] += m[i]
    return cm, cmx, cmy


def test_com_parity_bitexact_incl_dead():
    side, nc = 4.0, 3
    n = 300
    x, y, m = _random_particles(n, side)
    m[RNG.integers(0, n, 40)] = 0.0  # dead particles perturb the running mean
    key, valid = binning.cell_keys(jnp.asarray(x), jnp.asarray(y), side, nc)
    key_s, pid_s, x_s, y_s, m_s = binning.sort_by_cell(
        key, jnp.arange(n, dtype=jnp.int32), jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(m))
    M, MX, MY = com.com_parity(key_s, x_s, y_s, m_s, nc * nc)
    em, emx, emy = _com_oracle(np.asarray(key), x, y, m, nc * nc)
    np.testing.assert_array_equal(np.asarray(M), em)
    np.testing.assert_array_equal(np.asarray(MX), emx)
    np.testing.assert_array_equal(np.asarray(MY), emy)


def test_com_fast_close_to_parity():
    side, nc = 4.0, 3
    n = 300
    x, y, m = _random_particles(n, side)
    key, _ = binning.cell_keys(jnp.asarray(x), jnp.asarray(y), side, nc)
    key_s, _, x_s, y_s, m_s = binning.sort_by_cell(
        key, jnp.arange(n, dtype=jnp.int32), jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(m))
    Mp, MXp, MYp = com.com_parity(key_s, x_s, y_s, m_s, nc * nc)
    Mf, MXf, MYf = com.com_fast(key_s, x_s, y_s, m_s, nc * nc)
    np.testing.assert_allclose(np.asarray(Mf), np.asarray(Mp), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(MXf), np.asarray(MXp), rtol=1e-12)


def _stencil_oracle(cm, cmx, cmy, side, nc):
    """Independent temp-cell construction following the reference loops."""
    out = []
    for c in range(nc * nc):
        cx, cy = c % nc, c // nc
        cell_temps = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                tx = side if cx + dx >= nc else (-side if cx + dx < 0 else 0.0)
                ty = side if cy + dy >= nc else (-side if cy + dy < 0 else 0.0)
                nb = ((cx + dx) % nc) + ((cy + dy) % nc) * nc
                cell_temps.append((cm[nb], tx + cmx[nb], ty + cmy[nb]))
        out.append(cell_temps)
    return out


def _check_stencil(nc):
    side = 6.0
    ncells = nc * nc
    cm = RNG.uniform(0, 5, ncells)
    cmx = RNG.uniform(0, side, ncells)
    cmy = RNG.uniform(0, side, ncells)
    ml, mxl, myl = stencil.stencil_tables(
        jnp.asarray(cm), jnp.asarray(cmx), jnp.asarray(cmy), side, nc)
    exp = _stencil_oracle(cm, cmx, cmy, side, nc)
    for c in range(ncells):
        for l in range(8):
            assert float(ml[l, c]) == exp[c][l][0], (nc, c, l)
            assert float(mxl[l, c]) == exp[c][l][1], (nc, c, l)
            assert float(myl[l, c]) == exp[c][l][2], (nc, c, l)


def test_stencil_tables_match_reference_construction():
    _check_stencil(5)


def test_stencil_degenerate_grids():
    # ncside < 3: neighbors alias with distinct mirror offsets (SURVEY §2.4 P6).
    _check_stencil(1)
    _check_stencil(2)
