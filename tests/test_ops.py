"""Pallas op tests (interpret mode on CPU; compiled path covered on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from recbole_tpu.ops.masked_topk import masked_topk_pallas, masked_topk_xla


@pytest.mark.parametrize("n_items", [300, 1024, 2500])
def test_masked_topk_matches_xla(n_items):
    rng = np.random.RandomState(3)
    B, D, K = 16, 32, 5
    q = jnp.asarray(rng.randn(B, D).astype(np.float32))
    items = jnp.asarray(rng.randn(n_items, D).astype(np.float32))
    mask = np.zeros((B, n_items), np.int8)
    mask[:, 0] = 1
    for b in range(B):
        mask[b, rng.choice(n_items, min(40, n_items // 4), replace=False)] = 1
    mask = jnp.asarray(mask)
    v_ref, i_ref = masked_topk_xla(q, items, mask, K)
    v, i = masked_topk_pallas(q, items, mask, K, tile_n=512, interpret=True)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    # masked ids never returned
    m = np.asarray(mask)
    for b in range(v.shape[0]):
        assert not m[b, np.asarray(i)[b]].any()


def test_bipartite_prop_dense_matches_sparse():
    """Dense-MXU and edge-list segment-sum propagation agree."""
    import scipy.sparse as sp
    from recbole_tpu.ops.graph import BipartiteProp
    rng = np.random.RandomState(0)
    n_u, n_i, nnz = 50, 70, 400
    u = rng.randint(0, n_u, nnz)
    i = rng.randint(0, n_i, nnz)
    mat = sp.coo_matrix((np.ones(nnz, np.float32), (u, i)),
                        shape=(n_u, n_i)).tocsr()
    dense = BipartiteProp(mat, n_u, n_i)
    sparse = BipartiteProp(mat, n_u, n_i, dense_budget=1)
    assert dense.dense and not sparse.dense
    x = jnp.asarray(rng.randn(n_u + n_i, 16).astype(np.float32))
    np.testing.assert_allclose(np.asarray(dense(dense.init_consts(), x)),
                               np.asarray(sparse(sparse.init_consts(), x)),
                               rtol=2e-4, atol=2e-4)
