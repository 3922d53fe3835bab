"""Pallas GEMM kernels vs jnp golden references — exact int32 equality on
tile-edge shapes (SURVEY.md §4.2 item 1). Off-TPU these run in interpreter
mode automatically."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qnx.kernels.ternary_gemm import ternary_gemm
from qnx.kernels.xnor_gemm import xnor_gemm_int8, xnor_gemm_popcount
from qnx.ops import packing as P


def rand_pm1(key, shape):
    return jnp.where(jax.random.bernoulli(key, 0.5, shape), 1.0, -1.0)


SHAPES = [
    (8, 32, 8),       # single word
    (16, 784, 128),   # MNIST MLP first layer
    (3, 45, 7),       # nothing aligned
    (130, 100, 130),  # crosses 128-lane boundary
    (1, 33, 1),       # degenerate
]


class TestXnorGemmPopcount:
    @pytest.mark.parametrize("m,k,n", SHAPES)
    def test_exact_vs_dense(self, m, k, n):
        kx, kw = jax.random.split(jax.random.PRNGKey(m * 7 + k * 3 + n))
        x = rand_pm1(kx, (m, k))
        w = rand_pm1(kw, (k, n))
        out = xnor_gemm_popcount(P.pack_bits(x, -1), P.pack_bits(w, 0), k)
        np.testing.assert_array_equal(out, (x @ w).astype(jnp.int32))

    def test_small_blocks_multi_tile(self):
        # Mosaic-legal small blocks (bm % 8 == 0, bn % 128 == 0) with m NOT
        # a block multiple: exercises the grid and the padded edge tile.
        m, k, n = 80, 96, 256
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x, w = rand_pm1(kx, (m, k)), rand_pm1(kw, (k, n))
        out = xnor_gemm_popcount(
            P.pack_bits(x, -1), P.pack_bits(w, 0), k, block_m=32, block_n=128
        )
        np.testing.assert_array_equal(out, (x @ w).astype(jnp.int32))

    def test_mosaic_illegal_blocks_rejected(self):
        # Blocks the interpreter would accept but Mosaic cannot lower must
        # raise on every backend (round-3 on-chip suite finding).
        m, k, n = 70, 96, 50
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x, w = rand_pm1(kx, (m, k)), rand_pm1(kw, (k, n))
        xp, wp = P.pack_bits(x, -1), P.pack_bits(w, 0)
        with pytest.raises(ValueError, match="block_m"):
            xnor_gemm_popcount(xp, wp, k, block_m=12, block_n=n)
        with pytest.raises(ValueError, match="block_n"):
            xnor_gemm_popcount(xp, wp, k, block_m=m, block_n=32)


class TestXnorGemmInt8:
    @pytest.mark.parametrize("m,k,n", SHAPES)
    def test_exact_vs_dense(self, m, k, n):
        kx, kw = jax.random.split(jax.random.PRNGKey(m + k + n))
        x = rand_pm1(kx, (m, k))
        w = rand_pm1(kw, (k, n))
        out = xnor_gemm_int8(x.astype(jnp.int8), w.astype(jnp.int8))
        assert out.dtype == jnp.int32
        np.testing.assert_array_equal(out, (x @ w).astype(jnp.int32))


class TestTernaryGemm:
    @pytest.mark.parametrize("m,k,n", SHAPES)
    def test_exact_vs_dense(self, m, k, n):
        kx, kw = jax.random.split(jax.random.PRNGKey(m * 5 + k + n))
        x = rand_pm1(kx, (m, k))
        w = jax.random.randint(kw, (k, n), -1, 2).astype(jnp.float32)
        mask, sign, nnz = P.pack_ternary(w, axis=0)
        out = ternary_gemm(P.pack_bits(x, -1), mask, sign, nnz)
        np.testing.assert_array_equal(out, (x @ w).astype(jnp.int32))

    def test_all_zero_weights(self):
        x = rand_pm1(jax.random.PRNGKey(1), (4, 64))
        w = jnp.zeros((64, 8))
        mask, sign, nnz = P.pack_ternary(w, axis=0)
        out = ternary_gemm(P.pack_bits(x, -1), mask, sign, nnz)
        np.testing.assert_array_equal(out, jnp.zeros((4, 8), jnp.int32))


class TestDispatcher:
    @pytest.mark.parametrize("strategy", ["popcount", "int8"])
    def test_strategies_agree(self, strategy):
        from qnx.kernels.xnor_gemm import xnor_gemm

        m, k, n = 16, 64, 24
        kx, kw = jax.random.split(jax.random.PRNGKey(42))
        x, w = rand_pm1(kx, (m, k)), rand_pm1(kw, (k, n))
        out = xnor_gemm(P.pack_bits(x, -1), P.pack_bits(w, 0), k, strategy=strategy)
        np.testing.assert_array_equal(out, (x @ w).astype(jnp.int32))

    def test_unknown_strategy_raises(self):
        from qnx.kernels.xnor_gemm import xnor_gemm

        with pytest.raises(ValueError, match="unknown strategy"):
            xnor_gemm(jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32), 32, strategy="nope")
