"""ops/bit_kernels.py shift-plane Pallas kernels vs the dense unpack oracle
(interpret mode — runs on CPU; the real-TPU timing lives in
scripts/bench_bit_kernels.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _mk(rng, R, nbytes, D):
    packed = rng.randint(0, 256, (R, nbytes)).astype(np.uint8)
    v = rng.randn(nbytes * 8, D).astype(np.float32)
    g = rng.randn(R, D).astype(np.float32)
    # dense oracle via the XLA unpack
    from recbole_tpu.ops.bitgraph import _unpack_bits
    dense = np.asarray(_unpack_bits(jnp.asarray(packed))).astype(np.float32)
    return packed, v, g, dense


def test_bit_rows_matmul_matches_dense():
    from jax.experimental.pallas import tpu as pltpu
    from recbole_tpu.ops.bit_kernels import bit_rows_matmul, perm_planes

    rng = np.random.RandomState(0)
    R, nbytes, D = 256, 256, 64
    packed, v, g, dense = _mk(rng, R, nbytes, D)
    vb = jnp.asarray(v).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = bit_rows_matmul(jnp.asarray(packed), perm_planes(vb))
    ref = dense @ np.asarray(vb.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-2)


def test_bit_cols_matmul_matches_dense():
    from jax.experimental.pallas import tpu as pltpu
    from recbole_tpu.ops.bit_kernels import bit_cols_matmul, unperm_planes

    rng = np.random.RandomState(1)
    R, nbytes, D = 256, 256, 64
    packed, v, g, dense = _mk(rng, R, nbytes, D)
    gb = jnp.asarray(g).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = unperm_planes(bit_cols_matmul(jnp.asarray(packed), gb))
    ref = dense.T @ np.asarray(gb.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-2, atol=1e-2)


def test_perm_roundtrip():
    from recbole_tpu.ops.bit_kernels import perm_planes, unperm_planes

    x = jnp.arange(16 * 3, dtype=jnp.float32).reshape(16, 3)
    np.testing.assert_array_equal(np.asarray(unperm_planes(perm_planes(x))),
                                  np.asarray(x))
    # plane s holds columns c with c % 8 == s
    p = perm_planes(x)
    np.testing.assert_array_equal(np.asarray(p[3, 1]), np.asarray(x[8 + 3]))
