"""Pallas fused kernel vs the XLA fused pass (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from particlesimulation_tpu.config import EPSILON
from particlesimulation_tpu.ops import dense_xla
from particlesimulation_tpu.ops.pallas import cell_pairs

RNG = np.random.default_rng(11)


def _tiles(ncells=12, kcap=32, close_pairs=True):
    x = RNG.uniform(0, 1, (ncells, kcap)).astype(np.float32)
    y = RNG.uniform(0, 1, (ncells, kcap)).astype(np.float32)
    m = RNG.uniform(0.5, 2.0, (ncells, kcap)).astype(np.float32)
    m[:, 24:] = 0.0  # empty slots
    if close_pairs:
        # Plant colliding pairs (incl. a chain) in a few rows.
        for c in (1, 5):
            x[c, 1] = x[c, 0] + EPSILON / 3
            y[c, 1] = y[c, 0]
            x[c, 2] = x[c, 1] + EPSILON / 3
            y[c, 2] = y[c, 1]
    alive = (m > 0).astype(np.int32)
    return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(m),
            jnp.asarray(alive))


def test_fused_pallas_matches_fused_xla():
    ncells, kcap = 12, 32
    xd, yd, mfd, ad = _tiles(ncells, kcap)
    ref = dense_xla.fused_pairs(xd, yd, mfd, ad, ncells, kcap, EPSILON)
    got = cell_pairs.fused_pairs(xd, yd, mfd, ad, ncells, kcap, EPSILON)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))  # ft
    assert int(got[2]) == int(ref[2])                                      # count
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=2e-5, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=2e-5, atol=1e-12)


def test_fused_pallas_collide_false_prologue():
    ncells, kcap = 8, 32
    xd, yd, mfd, ad = _tiles(ncells, kcap)
    fx, fy, cnt, ft = cell_pairs.fused_pairs(xd, yd, mfd, ad, ncells, kcap,
                                             EPSILON, collide=False)
    assert int(cnt) == 0
    assert (np.asarray(ft) == 0x7FFFFFFF).all()
    fxr, fyr, _, _ = dense_xla.fused_pairs(xd, yd, mfd, ad, ncells, kcap,
                                           EPSILON, collide=False)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fxr), rtol=2e-5)


def test_fused_pallas_v2_matches_xla_v2():
    """The transposed v2 kernel vs dense_xla's v2: the discrete outputs
    (collision ranks, count) are bit-identical; forces agree to f32
    rounding (the transposed layout reduces the partner axis from a
    different position, so the f32 summation tree differs)."""
    ncells, kcap = 12, 32
    xd, yd, mfd, ad = _tiles(ncells, kcap)
    ref = dense_xla.fused_pairs_v2(xd, yd, mfd, ad, ncells, kcap, EPSILON)
    got = cell_pairs.fused_pairs_v2(xd, yd, mfd, ad, ncells, kcap, EPSILON)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    assert int(got[2]) == int(ref[2])
    scale = float(np.abs(np.asarray(ref[0])).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=scale * 1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-5, atol=scale * 1e-6)


def test_fused_pallas_v2_pid_tiebreak():
    """Permuted pid tiles (resident slot order != pid order) must resolve
    chain tie-breaks identically to the XLA v2 pass."""
    ncells, kcap = 12, 32
    xd, yd, mfd, ad = _tiles(ncells, kcap)
    pid = np.argsort(RNG.uniform(size=(ncells, kcap)), axis=1)
    pid = jnp.asarray(pid.astype(np.int32))
    ref = dense_xla.fused_pairs_v2(xd, yd, mfd, ad, ncells, kcap, EPSILON,
                                   pid=pid)
    got = cell_pairs.fused_pairs_v2(xd, yd, mfd, ad, ncells, kcap, EPSILON,
                                    pid=pid)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    assert int(got[2]) == int(ref[2])
    scale = float(np.abs(np.asarray(ref[0])).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=scale * 1e-6)


def test_fused_pallas_v4_matches_xla_v4():
    """The Pallas v4 force form vs dense_xla.fused_pairs_v4: collision
    outputs bit-identical, forces agree to f32 rounding (both compute the
    same recentered contraction algebra, different reduction trees)."""
    ncells, kcap = 12, 32
    xd, yd, mfd, ad = _tiles(ncells, kcap)
    pid = np.argsort(RNG.uniform(size=(ncells, kcap)), axis=1)
    pid = jnp.asarray(pid.astype(np.int32))
    ref = dense_xla.fused_pairs_v4(xd, yd, mfd, ad, ncells, kcap, EPSILON,
                                   pid=pid)
    got = cell_pairs.fused_pairs_v4(xd, yd, mfd, ad, ncells, kcap, EPSILON,
                                    pid=pid)
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))
    assert int(got[2]) == int(ref[2])
    scale = float(np.abs(np.asarray(ref[0])).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-4, atol=scale * 1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-4, atol=scale * 1e-5)


def test_fused_pallas_v4_collision_bits_match_v2():
    """v4's collision machinery is v2's exactly — ft and count must be
    bit-identical between the two Pallas kernels."""
    ncells, kcap = 12, 32
    xd, yd, mfd, ad = _tiles(ncells, kcap)
    r2 = cell_pairs.fused_pairs_v2(xd, yd, mfd, ad, ncells, kcap, EPSILON)
    r4 = cell_pairs.fused_pairs_v4(xd, yd, mfd, ad, ncells, kcap, EPSILON)
    np.testing.assert_array_equal(np.asarray(r4[3]), np.asarray(r2[3]))
    assert int(r4[2]) == int(r2[2])


def test_fused_pallas_v2_collide_false():
    ncells, kcap = 8, 32
    xd, yd, mfd, ad = _tiles(ncells, kcap)
    fx, fy, cnt, ft = cell_pairs.fused_pairs_v2(xd, yd, mfd, ad, ncells,
                                                kcap, EPSILON, collide=False)
    assert int(cnt) == 0
    assert (np.asarray(ft) == 0x7FFFFFFF).all()
    fxr, fyr, _, _ = dense_xla.fused_pairs_v2(xd, yd, mfd, ad, ncells, kcap,
                                              EPSILON, collide=False)
    scale = float(np.abs(np.asarray(fxr)).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fxr),
                               rtol=1e-5, atol=scale * 1e-6)
