"""sparse_adam parity: lazy_adam vs torch.optim.SparseAdam.

The reference's ``learner: sparse_adam`` is torch SparseAdam
(recbole/trainer/trainer.py:123): moments decay and params step ONLY on rows
the current gradient touches. Round 2 silently aliased it to dense adam —
these tests pin the real semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from recbole_tpu.trainer.lazy_adam import lazy_adam


def _run_lazy_jax(init, batches, lr):
    tx = lazy_adam(lr)
    params = {"w": jnp.asarray(init)}
    state = tx.init(params)
    for idx, vals in batches:
        g = jnp.zeros_like(params["w"]).at[jnp.asarray(idx)].add(
            jnp.asarray(vals))
        deltas, state = tx.update({"w": g}, state, params)
        params = jax.tree.map(lambda p, d: p + d, params, deltas)
    return np.asarray(params["w"])


def test_matches_torch_sparse_adam():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    init = rng.randn(8, 4).astype(np.float32)
    lr = 0.05
    # overlapping / disjoint / repeated-row batches, incl. duplicate indices
    batches = [
        (np.array([0, 2, 5]), rng.randn(3, 4).astype(np.float32)),
        (np.array([2, 3]), rng.randn(2, 4).astype(np.float32)),
        (np.array([5, 5, 7]), rng.randn(3, 4).astype(np.float32)),
        (np.array([0]), rng.randn(1, 4).astype(np.float32)),
    ]

    p = torch.nn.Parameter(torch.tensor(init))
    opt = torch.optim.SparseAdam([p], lr=lr)
    for idx, vals in batches:
        opt.zero_grad()
        p.grad = torch.sparse_coo_tensor(
            torch.tensor(idx)[None, :], torch.tensor(vals), (8, 4))
        opt.step()
    expect = p.detach().numpy()

    got = _run_lazy_jax(init, batches, lr)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_untouched_rows_frozen():
    """Rows never touched keep their exact initial values (dense adam would
    keep them too, but with decayed moments a later touch behaves
    differently — also asserted here)."""
    init = np.ones((4, 2), np.float32)
    g1 = np.full((1, 2), 0.5, np.float32)
    # touch row 1 at step 1, then nothing for many steps, then row 1 again
    batches = [(np.array([1]), g1)] + \
        [(np.array([0]), g1)] * 10 + [(np.array([1]), g1)]
    out = _run_lazy_jax(init, batches, lr=0.1)
    # rows 2,3 never touched
    np.testing.assert_array_equal(out[2], init[2])
    np.testing.assert_array_equal(out[3], init[3])

    # dense adam with the same stream moves row 1 during the idle steps
    # (momentum ghost updates); lazy adam must not
    import optax
    tx = optax.adam(0.1)
    params = {"w": jnp.asarray(init)}
    state = tx.init(params)
    for idx, vals in batches:
        g = jnp.zeros_like(params["w"]).at[jnp.asarray(idx)].add(
            jnp.asarray(vals))
        deltas, state = tx.update({"w": g}, state, params)
        params = jax.tree.map(lambda p, d: p + d, params, deltas)
    dense_out = np.asarray(params["w"])
    assert not np.allclose(out[1], dense_out[1])


def test_build_optimizer_dispatch():
    from recbole_tpu.trainer.trainer import build_optimizer

    class Cfg(dict):
        def __missing__(self, k):
            return None

    tx = build_optimizer(Cfg(learner="sparse_adam", learning_rate=0.01))
    params = {"w": jnp.ones((3, 2))}
    state = tx.init(params)
    g = {"w": jnp.zeros((3, 2)).at[0].set(1.0)}
    deltas, _ = tx.update(g, state, params)
    d = np.asarray(deltas["w"])
    assert np.all(d[1:] == 0) and np.all(d[0] != 0)
