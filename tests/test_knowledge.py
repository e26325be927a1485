"""KG dataset semantics + knowledge model smoke."""

import numpy as np
import pytest

from recbole_tpu import objective_function
from recbole_tpu.config.configurator import Config
from recbole_tpu.data.kg_dataset import KnowledgeBasedDataset


def test_entity_remap_sections(synth_dataset_dir):
    cfg = Config("CKE", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
    }, _parse_cmd_line=False)
    ds = KnowledgeBasedDataset(cfg)
    # linked entities share item ids: entity e1 <-> item i1
    i1 = ds.token2id("item_id", "i1")
    assert ds.field2token_id["entity_id"]["e1"] == i1
    # kg-only entities extend beyond n_items
    assert ds.entity_num > ds.item_num
    h, r, t = ds.kg_arrays()
    assert h.max() < ds.entity_num and t.max() < ds.entity_num
    assert r.max() < ds.relation_num - 1  # [UI-Relation] never appears in .kg
    assert ds.field2id_token["relation_id"][-1] == "[UI-Relation]"
    # ckg contains both directions of the interactions
    ch, cr, ct = ds.ckg_arrays()
    assert len(ch) == len(h) + 2 * ds.inter_num


@pytest.mark.parametrize("model", ["CKE", "CFKG", "KTUP", "MKR", "KGAT", "KGCN", "KGNNLS", "RippleNet"])
def test_kg_model_smoke(model, synth_dataset_dir, tmp_path):
    result = objective_function(
        config_dict={"model": model, "dataset": "synth",
                     "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     "epochs": 1, "train_batch_size": 256,
                     "state": "ERROR", "scan_epochs": False,
                     "valid_full_to_uni1000": False},
        saved=False)
    tr = result["test_result"]
    assert tr and all(0.0 <= v <= 1.0 for v in tr.values())


def test_ripplenet_single_path_matches_candidates(synth_dataset_dir, tmp_path):
    """The C=1 candidate-routed scoring path (<R_r^T v, h> logits) must
    equal the memory-routed path (<R_r h, v>) used for full-sort eval."""
    import jax
    import jax.numpy as jnp
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model

    cfg = Config("RippleNet", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log")}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, _, _ = data_preparation(cfg, ds)
    m = get_model("RippleNet")(cfg, train.dataset)
    params = m.init_params(jax.random.key(0, impl="rbg"))
    user = jnp.arange(16) % m.n_users
    item = (jnp.arange(16) * 7) % m.n_items
    s1 = m._score_single(params, user, item)
    s2 = m._score_candidates(params, user, item[:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=2e-4, atol=1e-5)
    # memory-routed R h matches an explicit per-row dense reconstruction
    _, (rh_all, h_all, t_all, r_all) = m._score_single(
        params, user, item, return_kg=True)
    Rm = np.asarray(params["relation_embedding"])
    rh_ref = np.einsum("bhmij,bhmj->bhmi",
                       Rm[np.asarray(r_all)], np.asarray(h_all))
    np.testing.assert_allclose(np.asarray(rh_all), rh_ref,
                               rtol=2e-4, atol=1e-5)


def test_kgat_dense_path_matches_full_ell(synth_dataset_dir, tmp_path):
    """Single-layer dense bipartite propagation == full-graph ELL
    propagation (same params, no dropout) on forward and loss grads."""
    import jax
    import jax.numpy as jnp
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model

    cfg = Config("KGAT", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log")}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, _, _ = data_preparation(cfg, ds)
    m_dense = get_model("KGAT")(cfg, train.dataset)
    assert m_dense.dense_path, "single-layer KGAT should take the dense path"
    m_full = get_model("KGAT")(cfg, train.dataset)
    m_full.dense_path = False
    from recbole_tpu.ops.edge_prop import build_ell_consts
    # ELL over the UNIQUE head-sorted pairs (the edge_attention convention)
    h2, r2, t2 = train.dataset.ckg_arrays()
    uniq_keys = np.unique(h2.astype(np.int64) * m_full.n_nodes
                          + t2.astype(np.int64))
    ell_consts, m_full._ell_shapes = build_ell_consts(
        (uniq_keys // m_full.n_nodes).astype(np.int32),
        (uniq_keys % m_full.n_nodes).astype(np.int32), m_full.n_nodes)
    m_full._ell = {k: m_full.register_const(k, v)
                   for k, v in ell_consts.items()}

    params = m_dense.init_params(jax.random.key(0, impl="rbg"))
    ue1, ie1 = m_dense.propagate(params)
    ue2, ie2 = m_full.propagate(params)
    np.testing.assert_allclose(np.asarray(ue1), np.asarray(ue2),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ie1), np.asarray(ie2),
                               rtol=2e-4, atol=1e-5)

    batch = {m_dense.USER_ID: jnp.arange(8) % m_dense.n_users,
             m_dense.ITEM_ID: jnp.arange(8) % m_dense.n_items,
             m_dense.NEG_ITEM_ID: (jnp.arange(8) * 3) % m_dense.n_items}
    g1 = jax.grad(lambda p: m_dense.calculate_loss(p, batch))(
        {k: v for k, v in params.items()})
    g2 = jax.grad(lambda p: m_full.calculate_loss(p, batch))(
        {k: v for k, v in params.items()})
    for key in ("user_embedding", "entity_embedding"):
        np.testing.assert_allclose(np.asarray(g1[key]), np.asarray(g2[key]),
                                   rtol=2e-4, atol=1e-5)

    # per-epoch dense rebuild keeps the blocks in sync with edge_attention
    p2 = m_dense.update_attentive_A(params)
    a_ui = np.asarray(p2["_const"]["att_ui_dense"])
    att = np.asarray(p2["edge_attention"])
    np.testing.assert_allclose(a_ui[np.asarray(m_dense._ui_rows),
                                    np.asarray(m_dense._ui_cols)],
                               att[np.asarray(m_dense._ui_sel)], rtol=1e-5)


@pytest.mark.parametrize("aggregator", ["sum", "neighbor", "concat"])
def test_kgcn_dense_full_sort_matches_pair_path(synth_dataset_dir, tmp_path,
                                                aggregator):
    """KGCN's dense single-hop full_sort_predict (per-chunk gathers shared
    across the user batch) must equal the chunked per-pair scoring path."""
    import jax
    import jax.numpy as jnp
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model

    cfg = Config("KGCN", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "aggregator": aggregator,
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log")}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, _, _ = data_preparation(cfg, ds)
    m = get_model("KGCN")(cfg, train.dataset)
    assert not m.full_sort_fallback
    params = m.init_params(jax.random.key(0, impl="rbg"))
    users = jnp.arange(8) % m.n_users
    batch = {cfg["USER_ID_FIELD"]: users}
    dense = m.full_sort_predict(params, batch)
    cand = jnp.broadcast_to(jnp.arange(m.n_items, dtype=jnp.int32)[None, :],
                            (8, m.n_items))
    pairs = m.score_items(params, batch, cand)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(pairs),
                               rtol=2e-4, atol=1e-5)


def test_ripplenet_loss_formula(synth_dataset_dir, tmp_path):
    """Pin the loss composition to the reference formula: BCE − kg_weight *
    Σ_hop mean(σ(hRt)) + reg_weight * (Σ_hop EmbLoss(h,t,r) + EmbLoss(W))
    (reference ripplenet.py:220-252)."""
    import jax
    import jax.numpy as jnp
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model

    cfg = Config("RippleNet", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log")}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, _, _ = data_preparation(cfg, ds)
    m = get_model("RippleNet")(cfg, train.dataset)
    params = m.init_params(jax.random.key(0, impl="rbg"))
    B = 8
    user = jnp.arange(B) % m.n_users
    item = (jnp.arange(B) * 5) % m.n_items
    batch = {m.USER_ID: user, m.ITEM_ID: item,
             m.LABEL: jnp.ones(B, jnp.float32)}
    parts = m.calculate_loss(params, batch)
    _, kg_part, reg_part = [float(p) for p in parts]

    _, (rh, h_all, t_all, r_all) = m._score_single(
        params, user, item, return_kg=True)
    rh, h_all, t_all = map(np.asarray, (rh, h_all, t_all))
    r_all = np.asarray(r_all)
    Rm = np.asarray(params["relation_embedding"])
    W = np.asarray(params["transform"])
    rec = (t_all * rh).sum(-1)
    kge = sum(float(np.mean(1 / (1 + np.exp(-rec[:, hop]))))
              for hop in range(m.n_hop))
    np.testing.assert_allclose(kg_part, -m.kg_weight * kge,
                               rtol=1e-5, atol=1e-7)
    reg = 0.0
    for hop in range(m.n_hop):
        # EmbLoss over the flattened (B*M, ·) gathers divides by B*M
        reg += (np.linalg.norm(h_all[:, hop])
                + np.linalg.norm(t_all[:, hop])
                + np.linalg.norm(Rm[r_all[:, hop]])) / (B * m.n_memory)
    reg += np.linalg.norm(W) / W.shape[0]
    np.testing.assert_allclose(reg_part, m.reg_weight * reg,
                               rtol=1e-5, atol=1e-9)
