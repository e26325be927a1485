"""Round-4 fixes pinned by tests:

* sparse_adam x weight_decay: reference warns and DROPS decay for SparseAdam
  (recbole/trainer/trainer.py:123-126); decay must not densify the lazy mask.
* checkpoints strip the dataset-derived params["_const"] subtree and rebuild
  it on resume/load (reference stores only learned state_dict).
* BitRestrictedGraph auto-enable is gated on a byte budget (its packed
  images are dense in the node grid, not edge-proportional).
"""

import glob
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from recbole_tpu.config.configurator import Config
from recbole_tpu.data.utils import create_dataset, data_preparation
from recbole_tpu.models import get_model
from recbole_tpu.trainer.trainer import build_optimizer, get_trainer


class _Cfg(dict):
    def __missing__(self, k):
        return None


def test_sparse_adam_ignores_weight_decay():
    """With weight_decay > 0, sparse_adam must (a) leave untouched rows
    bit-identical and (b) step touched rows exactly as decay-free
    sparse_adam would."""
    tx_wd = build_optimizer(_Cfg(learner="sparse_adam", learning_rate=0.01,
                                 weight_decay=0.1))
    tx_plain = build_optimizer(_Cfg(learner="sparse_adam",
                                    learning_rate=0.01))
    params = {"w": jnp.ones((5, 3))}
    g = {"w": jnp.zeros((5, 3)).at[1].set(0.7)}
    d_wd, _ = tx_wd.update(g, tx_wd.init(params), params)
    d_plain, _ = tx_plain.update(g, tx_plain.init(params), params)
    d = np.asarray(d_wd["w"])
    # untouched rows: delta exactly zero (decay would have moved them all)
    assert np.all(d[[0, 2, 3, 4]] == 0.0)
    # touched row: identical to the decay-free optimizer (decay dropped,
    # not merely masked)
    np.testing.assert_array_equal(d, np.asarray(d_plain["w"]))


def test_dense_adam_still_applies_weight_decay():
    tx = build_optimizer(_Cfg(learner="adam", learning_rate=0.01,
                              weight_decay=0.1))
    params = {"w": jnp.ones((4, 2))}
    g = {"w": jnp.zeros((4, 2)).at[0].set(0.5)}
    deltas, _ = tx.update(g, tx.init(params), params)
    assert np.all(np.asarray(deltas["w"])[1:] != 0.0)


def _lightgcn_pipeline(synth_dataset_dir, tmp_path, epochs):
    cfg = Config("LightGCN", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log"),
        "epochs": epochs, "scan_epochs": False, "seed": 7,
        "use_restricted_step": True,  # force bg_* consts onto tiny graph
        "valid_full_to_uni1000": False}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, test = data_preparation(cfg, ds)
    model = get_model("LightGCN")(cfg, train.dataset)
    trainer = get_trainer(cfg["MODEL_TYPE"], "LightGCN")(cfg, model)
    return trainer, train, valid, test


def test_checkpoint_strips_and_rebuilds_const(synth_dataset_dir, tmp_path):
    trainer, train, valid, test = _lightgcn_pipeline(
        synth_dataset_dir, tmp_path, 2)
    trainer.fit(train, valid, verbose=False, saved=True)
    assert isinstance(trainer.params, dict) and "_const" in trainer.params
    ckpts = glob.glob(str(tmp_path / "saved" / "LightGCN-*.ckpt"))
    assert ckpts
    with open(ckpts[0], "rb") as fh:
        state = pickle.load(fh)
    assert "_const" not in state["params"], \
        "checkpoint must not carry dataset-derived consts"
    assert "user_embedding" in state["params"]

    # resume: consts rebuilt, learned leaves restored bit-exact, training
    # continues through the masked optimizer without tree mismatch
    trainer2, train2, valid2, _ = _lightgcn_pipeline(
        synth_dataset_dir, tmp_path, 4)
    trainer2.resume_checkpoint(ckpts[0])
    assert "_const" in trainer2.params
    assert "bg_user_bits" in trainer2.params["_const"]
    np.testing.assert_array_equal(
        np.asarray(trainer2.params["user_embedding"]),
        state["params"]["user_embedding"])
    score, result = trainer2.fit(train2, valid2, verbose=False, saved=False)
    assert result is not None

    # evaluate(load_best_model) path rebuilds consts too
    trainer3, _, _, test3 = _lightgcn_pipeline(
        synth_dataset_dir, tmp_path, 2)
    res = trainer3.evaluate(test3, load_best_model=True, model_file=ckpts[0])
    assert res and all(np.isfinite(v) for v in res.values())


def test_reattach_consts_reproduces_frozen_tables(synth_dataset_dir,
                                                  tmp_path):
    """DIN keeps RNG-derived frozen feature tables in params["_const"]
    (feat_embed.py): the checkpoint-strip rebuild must reproduce them
    bit-identically by replaying prepare()'s init-key split."""
    cfg = Config("DIN", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log"),
        "epochs": 1, "seed": 33,
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"],
                     "item": "*"},
        "valid_full_to_uni1000": False}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, test = data_preparation(cfg, ds)
    model = get_model("DIN")(cfg, train.dataset)
    t1 = get_trainer(cfg["MODEL_TYPE"], "DIN")(cfg, model)
    t1.prepare(train)
    const1 = t1.params["_const"]
    stripped = {k: v for k, v in t1.params.items() if k != "_const"}

    t2 = get_trainer(cfg["MODEL_TYPE"], "DIN")(cfg, model)
    rebuilt = t2._reattach_consts(stripped)
    assert set(rebuilt["_const"]) == set(const1)
    for k in const1:
        np.testing.assert_array_equal(np.asarray(rebuilt["_const"][k]),
                                      np.asarray(const1[k]), err_msg=k)

    # the quick_start flow calls evaluate(load_best_model=True) AFTER fit,
    # when self.rng has advanced far past the construction seed — the
    # rebuild key must come from the pristine seed, not the live rng
    t1.rng, _ = jax.random.split(t1.rng, 2)
    t1.rng, _ = jax.random.split(t1.rng, 2)
    rebuilt2 = t1._reattach_consts(stripped)
    for k in const1:
        np.testing.assert_array_equal(np.asarray(rebuilt2["_const"][k]),
                                      np.asarray(const1[k]),
                                      err_msg=f"post-fit {k}")


def test_bitgraph_budget_gates_default(synth_dataset_dir, tmp_path,
                                       monkeypatch):
    import recbole_tpu.ops.bitgraph as bg

    def build(extra):
        cfg = Config("LightGCN", "synth", config_dict={
            "data_path": synth_dataset_dir, "state": "ERROR",
            "checkpoint_dir": str(tmp_path / "saved"),
            "log_dir": str(tmp_path / "log"), **extra},
            _parse_cmd_line=False)
        ds = create_dataset(cfg)
        train, _, _ = data_preparation(cfg, ds)
        return get_model("LightGCN")(cfg, train.dataset)

    # over budget -> default OFF; explicit config still forces ON
    monkeypatch.setattr(bg, "BITGRAPH_BUDGET_BYTES", 0)
    assert build({}).use_restricted is False
    m = build({"use_restricted_step": True})
    assert m.use_restricted is True and hasattr(m, "bitgraph")
    # footprint formula: two padded byte-images (256-byte tile padding)
    assert bg.bitgraph_bytes(102_046, 98_408) == \
        102_046 * (-(-(-(-98_408 // 8)) // 256) * 256) \
        + 98_408 * (-(-(-(-102_046 // 8)) // 256) * 256)
