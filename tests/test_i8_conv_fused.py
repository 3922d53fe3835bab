"""Fused Pallas int8 conv+epilogue kernel vs the XLA-composed I8Conv.

Bit-exactness of qnx.kernels.i8_conv_fused against qnx.nn.int8_engine.I8Conv
(the layer it can replace per-shape): sign codes, level codes, fused maxpool,
partial batch tiles, and the I8Conv(fused=True) routing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qnx.kernels.i8_conv_fused import i8_conv_fused
from qnx.nn.int8_engine import I8Conv


def _case(seed, b, h, c, n, levels):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    if levels == 1:
        x = (jax.random.bernoulli(k1, 0.5, (b, h, h, c)).astype(jnp.int8)
             * 2 - 1)
    else:
        x = jax.random.randint(k1, (b, h, h, c), 0, levels + 1, jnp.int8)
    w = jax.random.randint(k2, (3, 3, c, n), -1, 2, jnp.int8)
    sgn = jax.random.choice(k3, jnp.array([-1, 1], jnp.int32), (n,))
    tau = jnp.sort(jax.random.randint(k4, (levels, n), -20, 20, jnp.int32), 0)
    return x, w, sgn, tau


@pytest.mark.parametrize("levels", [1, 3])
@pytest.mark.parametrize("pool", [False, True])
def test_fused_matches_i8conv(levels, pool):
    x, w, sgn, tau = _case(0, 4, 8, 32, 64, levels)
    ref = I8Conv(w8=w, sgn=sgn, tau=tau[0] if levels == 1 else tau,
                 act="pm1" if levels == 1 else "levels", pool=pool)(x)
    out = i8_conv_fused(x, w, sgn, tau, levels=levels, pool=pool,
                        block_b=2, block_n=64)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_fused_partial_tiles():
    """Batch not divisible by block_b exercises grid padding."""
    x, w, sgn, tau = _case(1, 3, 8, 32, 64, 1)
    ref = I8Conv(w8=w, sgn=sgn, tau=tau[0], act="pm1")(x)
    out = i8_conv_fused(x, w, sgn, tau, block_b=2, block_n=64)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_i8conv_fused_flag_routes():
    x, w, sgn, tau = _case(2, 2, 8, 32, 64, 1)
    base = I8Conv(w8=w, sgn=sgn, tau=tau[0], act="pm1", pool=True)
    fused = I8Conv(w8=w, sgn=sgn, tau=tau[0], act="pm1", pool=True,
                   fused=True)
    np.testing.assert_array_equal(np.asarray(base(x)), np.asarray(fused(x)))


def test_fused_ternary_weights():
    """w8 in {-1,0,+1} (ternary) needs no special casing."""
    x, w, sgn, tau = _case(3, 2, 8, 32, 64, 1)
    assert bool(jnp.any(w == 0))
    ref = I8Conv(w8=w, sgn=sgn, tau=tau[0], act="pm1")(x)
    out = i8_conv_fused(x, w, sgn, tau, block_b=1, block_n=64)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
