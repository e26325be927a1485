"""ops/bitgraph.py: packed-bit restricted adjacency ops and the
2-full-apply LightGCN training step.

Oracle: dense numpy A_hat = D_u^-1/2 B D_i^-1/2 on small random bipartite
graphs. The restricted ops run their matmuls in bf16 (exact for the {0,1}
bit operand; the embedding operand rounds), so comparisons use bf16-scale
tolerances."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from recbole_tpu.ops.bitgraph import (
    BitRestrictedGraph, LinearPropBatch, restricted_rows_apply,
    restricted_cols_apply, rows_to_dense, take_rows)
from recbole_tpu.ops.graph import BipartiteProp


def small_graph(seed=0, n_users=37, n_items=53, n_edges=400):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, n_users, n_edges)
    i = rng.randint(0, n_items, n_edges)
    key = np.unique(u.astype(np.int64) * n_items + i)
    u, i = (key // n_items).astype(np.int32), (key % n_items).astype(np.int32)
    mat = sp.csr_matrix((np.ones(len(u), np.float32), (u, i)),
                        shape=(n_users, n_items))
    du = np.bincount(u, minlength=n_users).astype(np.float32)
    di = np.bincount(i, minlength=n_items).astype(np.float32)
    B = mat.toarray()
    A = (1.0 / np.sqrt(np.maximum(du, 1.0)))[:, None] * B \
        * (1.0 / np.sqrt(np.maximum(di, 1.0)))[None, :]
    return mat, A, n_users, n_items


def test_restricted_rows_matches_dense():
    mat, A, n_users, n_items = small_graph()
    bg = BitRestrictedGraph(mat, n_users, n_items)
    c = bg.init_consts()
    rng = np.random.RandomState(1)
    v = rng.randn(n_items, 8).astype(np.float32)
    rows = np.array([0, 3, 3, 11, n_users - 1], np.int32)
    got = restricted_rows_apply(c["bg_user_bits"], jnp.asarray(rows),
                                c["bg_unorm"], c["bg_inorm"], jnp.asarray(v))
    want = A[rows] @ v
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-2, atol=5e-3)


def test_restricted_rows_item_side():
    mat, A, n_users, n_items = small_graph(seed=2)
    bg = BitRestrictedGraph(mat, n_users, n_items)
    c = bg.init_consts()
    rng = np.random.RandomState(3)
    v = rng.randn(n_users, 8).astype(np.float32)
    rows = np.arange(n_items, dtype=np.int32)
    got = restricted_rows_apply(c["bg_item_bits"], jnp.asarray(rows),
                                c["bg_inorm"], c["bg_unorm"], jnp.asarray(v))
    want = A.T[rows] @ v
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-2, atol=5e-3)


def test_restricted_cols_sums_duplicates():
    mat, A, n_users, n_items = small_graph(seed=4)
    bg = BitRestrictedGraph(mat, n_users, n_items)
    c = bg.init_consts()
    rng = np.random.RandomState(5)
    rows = np.array([7, 7, 2, 19], np.int32)       # duplicate item 7
    g = rng.randn(len(rows), 8).astype(np.float32)
    got = restricted_cols_apply(c["bg_item_bits"], jnp.asarray(rows),
                                c["bg_inorm"], c["bg_unorm"],
                                jnp.asarray(g), n_users)
    # A_hat[:, rows] @ g over the user side: columns of A at the item rows
    want = np.zeros((n_users, 8), np.float32)
    for r, grow in zip(rows, g):
        want += A[:, r][:, None] * grow[None, :]
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-2, atol=5e-3)


def test_rows_to_dense_and_take_rows():
    rows = jnp.asarray(np.array([5, 1, 5, 0], np.int32))
    vals = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    dense = np.asarray(rows_to_dense(rows, vals, 7))
    want = np.zeros((7, 4), np.float32)
    for r, v in zip([5, 1, 5, 0], np.asarray(vals)):
        want[r] += v
    np.testing.assert_allclose(dense, want)

    x = jnp.asarray(np.random.RandomState(0).randn(7, 4).astype(np.float32))
    def f(x):
        return jnp.sum(take_rows(7, x, rows) ** 2)
    g = jax.grad(f)(x)
    g_ref = jax.grad(lambda x: jnp.sum(x[rows] ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-6)


@pytest.mark.parametrize("n_layers", [1, 2, 3])
def test_linear_prop_batch_matches_full(n_layers):
    mat, A, n_users, n_items = small_graph(seed=6)
    prop = BipartiteProp(mat, n_users, n_items)
    bg = BitRestrictedGraph(mat, n_users, n_items)
    consts = {**prop.init_consts(), **bg.init_consts()}
    lpb = LinearPropBatch(prop, n_users, n_items, n_layers)
    rng = np.random.RandomState(7)
    xu = jnp.asarray(rng.randn(n_users, 8).astype(np.float32) * 0.1)
    xi = jnp.asarray(rng.randn(n_items, 8).astype(np.float32) * 0.1)
    rows_u = jnp.asarray(np.array([0, 4, 4, 20], np.int32))
    rows_i = jnp.asarray(np.array([9, 0, 31, 9], np.int32))

    e_u, e_i = lpb(consts, xu, xi, rows_u, rows_i)

    # dense full-propagation oracle
    full = np.block([[np.zeros((n_users, n_users)), A],
                     [A.T, np.zeros((n_items, n_items))]]).astype(np.float32)
    x = np.concatenate([np.asarray(xu), np.asarray(xi)], 0)
    acc, t = x.copy(), x.copy()
    for _ in range(n_layers):
        t = full @ t
        acc += t
    final = acc / (n_layers + 1)
    np.testing.assert_allclose(np.asarray(e_u), final[np.asarray(rows_u)],
                               rtol=3e-2, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(e_i), final[n_users + np.asarray(rows_i)],
        rtol=3e-2, atol=5e-3)


@pytest.mark.parametrize("n_layers", [1, 2])
def test_linear_prop_batch_grad_matches_full(n_layers):
    """BPR-shaped loss: grads through the restricted VJP vs autodiff through
    full propagation + gather."""
    mat, A, n_users, n_items = small_graph(seed=8)
    prop = BipartiteProp(mat, n_users, n_items)
    bg = BitRestrictedGraph(mat, n_users, n_items)
    consts = {**prop.init_consts(), **bg.init_consts()}
    lpb = LinearPropBatch(prop, n_users, n_items, n_layers)
    rng = np.random.RandomState(9)
    xu = rng.randn(n_users, 8).astype(np.float32) * 0.1
    xi = rng.randn(n_items, 8).astype(np.float32) * 0.1
    rows_u = jnp.asarray(rng.randint(0, n_users, 6).astype(np.int32))
    rows_i = jnp.asarray(rng.randint(0, n_items, 6).astype(np.int32))

    def loss_restricted(p):
        e_u, e_i = lpb(consts, p["u"], p["i"], rows_u, rows_i)
        return jnp.sum(jnp.tanh(jnp.sum(e_u * e_i, axis=-1)))

    def loss_full(p):
        x = jnp.concatenate([p["u"], p["i"]], 0)
        acc, t = x, x
        for _ in range(n_layers):
            t = prop(consts, t)
            acc = acc + t
        final = acc / (n_layers + 1)
        e_u = final[rows_u]
        e_i = final[n_users + rows_i]
        return jnp.sum(jnp.tanh(jnp.sum(e_u * e_i, axis=-1)))

    p = {"u": jnp.asarray(xu), "i": jnp.asarray(xi)}
    g_res = jax.grad(loss_restricted)(p)
    g_ful = jax.grad(loss_full)(p)
    for k in ("u", "i"):
        np.testing.assert_allclose(np.asarray(g_res[k]), np.asarray(g_ful[k]),
                                   rtol=5e-2, atol=2e-3)


def test_lightgcn_restricted_loss_matches_full(synth_dataset_dir):
    """LightGCN with use_restricted_step=True computes the same loss and
    gradients as the full-propagation path on an identical batch."""
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.dataset import Dataset
    from recbole_tpu.models import get_model

    rng = np.random.RandomState(11)
    out = {}
    for flag in (True, False):
        config = Config(model="LightGCN", config_dict={
            "dataset": "synth", "data_path": synth_dataset_dir,
            "use_restricted_step": flag, "seed": 42})
        ds = Dataset(config)
        model = get_model("LightGCN")(config, ds)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = {
            model.USER_ID: jnp.asarray(
                rng.randint(1, model.n_users, 32).astype(np.int32)),
            model.ITEM_ID: jnp.asarray(
                rng.randint(1, model.n_items, 32).astype(np.int32)),
            model.NEG_ITEM_ID: jnp.asarray(
                rng.randint(1, model.n_items, 32).astype(np.int32)),
        }
        rng = np.random.RandomState(11)  # same batch for both paths
        loss, grads = jax.value_and_grad(
            lambda p: model.calculate_loss(p, batch), allow_int=True)(params)
        out[flag] = (float(loss), grads)
    l_res, g_res = out[True]
    l_ful, g_ful = out[False]
    assert np.isfinite(l_res)
    assert abs(l_res - l_ful) < 5e-3 * max(1.0, abs(l_ful))
    for k in ("user_embedding", "item_embedding"):
        np.testing.assert_allclose(np.asarray(g_res[k]), np.asarray(g_ful[k]),
                                   rtol=5e-2, atol=2e-3)


def test_lightgcn_restricted_end_to_end(synth_dataset_dir, tmp_path):
    """Full pipeline (train + eval) with the restricted step forced on."""
    from recbole_tpu import objective_function
    result = objective_function(
        config_dict={"model": "LightGCN", "dataset": "synth",
                     "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     "use_restricted_step": True,
                     "scan_epochs": False, "epochs": 2,
                     "train_batch_size": 256, "eval_batch_size": 256,
                     "state": "ERROR", "valid_full_to_uni1000": False},
        saved=False)
    tr = result["test_result"]
    assert tr
    for k, v in tr.items():
        assert 0.0 <= v <= 1.0, f"metric {k}={v} out of range"


def test_trainer_cost_analysis(synth_dataset_dir):
    """Trainer.cost_analysis returns per-step flops/bytes for the compiled
    train program (backs the MFU columns in scripts/bench_models.py)."""
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer

    cfg = Config("BPR", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "epochs": 1, "scan_epochs": True,
        "valid_full_to_uni1000": False}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, test = data_preparation(cfg, ds)
    model = get_model("BPR")(cfg, train.dataset)
    trainer = get_trainer(cfg["MODEL_TYPE"], "BPR")(cfg, model)
    trainer.prepare(train)
    ca = trainer.cost_analysis(train)
    if ca is None:
        import pytest
        pytest.skip("backend exposes no cost analysis")
    assert ca["flops_per_step"] > 0
    assert ca["steps_per_epoch"] >= 1


def test_take_rows_nd_indices():
    """take_rows with (B, L)-shaped indices: gradient equals autodiff's."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(9, 4).astype(np.float32))
    rows = jnp.asarray(rng.randint(0, 9, (5, 3)).astype(np.int32))

    def f(x):
        return jnp.sum(jnp.tanh(take_rows(9, x, rows)) * 0.5)

    def f_ref(x):
        return jnp.sum(jnp.tanh(x[rows]) * 0.5)

    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               np.asarray(jax.grad(f_ref)(x)), rtol=1e-6)

    # 1-D value table too (bias vectors)
    b = jnp.asarray(rng.randn(9).astype(np.float32))
    gb = jax.grad(lambda b: jnp.sum(take_rows(9, b, rows) ** 2))(b)
    gb_ref = jax.grad(lambda b: jnp.sum(b[rows] ** 2))(b)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), rtol=1e-6)
