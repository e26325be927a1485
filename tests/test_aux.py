"""Auxiliary subsystem tests: hyper search, case study, social dataset,
decision-tree bridge registration."""

import os

import numpy as np
import pytest

from recbole_tpu import objective_function
from recbole_tpu.utils.hyper_tuning import HyperTuning


def test_hyper_tuning_exhaustive(synth_dataset_dir, tmp_path):
    """Grid search over 2 embedding sizes picks a best param set and exports
    results (parity: reference HyperTuning + exhaustive_search)."""
    params_file = tmp_path / "hyper.test"
    params_file.write_text("embedding_size choice [8,16]\n")

    def objective(config_dict, config_file_list):
        config_dict.update({
            "model": "BPR", "dataset": "synth",
            "data_path": synth_dataset_dir,
            "checkpoint_dir": str(tmp_path / "saved"),
            "log_dir": str(tmp_path / "log"),
            "epochs": 1, "state": "ERROR", "scan_epochs": False,
        })
        return objective_function(config_dict=config_dict,
                                  config_file_list=config_file_list,
                                  saved=False)

    hp = HyperTuning(objective, params_file=str(params_file),
                     algo="exhaustive", max_evals=4)
    hp.run()
    assert hp.best_params is not None
    assert hp.best_params["embedding_size"] in (8, 16)
    assert len(hp.params2result) == 2
    out = tmp_path / "hyper.result"
    hp.export_result(str(out))
    assert "Test result" in out.read_text()


def test_hyper_tuning_file_formats(tmp_path):
    f = tmp_path / "p.test"
    f.write_text("learning_rate loguniform -8,0\n"
                 "embedding_size choice [64,96]\n"
                 "dropout quniform 0.0,0.9,0.1\n"
                 "alpha uniform 0,1\n")
    hp = HyperTuning(lambda cd, cfl: None, params_file=str(f), algo="random",
                     max_evals=1)
    kinds = {p.name: p.kind for p in hp.params}
    assert kinds == {"learning_rate": "loguniform",
                     "embedding_size": "choice",
                     "dropout": "quniform", "alpha": "uniform"}
    rng = np.random.RandomState(0)
    lr = [p for p in hp.params if p.name == "learning_rate"][0].sample(rng)
    assert np.exp(-8) <= lr <= 1.0


def test_case_study_topk(synth_dataset_dir, tmp_path):
    """full_sort_topk excludes train/valid history and returns k item ids
    (parity: reference case_study.py:23-88)."""
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer
    from recbole_tpu.utils.case_study import full_sort_topk

    cfg = Config("BPR", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log"),
        "epochs": 1, "scan_epochs": False}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, test = data_preparation(cfg, ds)
    model = get_model("BPR")(cfg, train.dataset)
    trainer = get_trainer(cfg["MODEL_TYPE"], "BPR")(cfg, model)
    trainer.fit(train, None, verbose=False, saved=False)

    uids = np.array([1, 2, 3])
    scores, topk = full_sort_topk(uids, model, trainer.params, test, k=5)
    assert scores.shape == (3, 5) and topk.shape == (3, 5)
    assert (topk != 0).all()  # PAD never recommended
    # masked history: no recommended item may be in the user's train history
    hist, hlen = ds.history_item_matrix()
    for r, u in enumerate(uids):
        seen = set(hist[u][:hlen[u]].tolist())
        assert not seen.intersection(topk[r].tolist())


def test_social_dataset(tmp_path):
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.social_dataset import SocialDataset

    root = tmp_path / "data" / "soc"
    os.makedirs(root)
    with open(root / "soc.inter", "w") as fh:
        fh.write("user_id:token\titem_id:token\trating:float\ttimestamp:float\n")
        for u in range(1, 5):
            for i in range(1, 4):
                fh.write(f"u{u}\ti{i}\t5\t{u * 10 + i}\n")
    with open(root / "soc.net", "w") as fh:
        fh.write("source_id:token\ttarget_id:token\n")
        fh.write("u1\tu2\nu2\tu3\nu3\tu4\n")
    cfg = Config("BPR", "soc", config_dict={
        "data_path": str(tmp_path / "data"), "state": "ERROR",
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
    }, _parse_cmd_line=False)
    ds = SocialDataset(cfg)
    assert ds.net_num == 3
    mat = ds.net_matrix()
    assert mat.shape == (ds.user_num, ds.user_num)
    assert mat.nnz == 3
    # source/target remapped into the user id space
    u1 = ds.token2id("user_id", "u1")
    u2 = ds.token2id("user_id", "u2")
    assert mat.tocsr()[u1, u2] == 1.0


def test_exlib_models_registered_and_gated():
    from recbole_tpu.models import model_names, get_model
    names = model_names()
    assert "xgboost" in names and "lightgbm" in names
    try:
        import xgboost  # noqa: F401
        has_xgb = True
    except ImportError:
        has_xgb = False
    if not has_xgb:
        with pytest.raises(ImportError, match="xgboost"):
            get_model("xgboost")(_FakeConfig(), None)


class _FakeConfig(dict):
    def __getitem__(self, k):
        return self.get(k)


def _labeled_base(synth_dataset_dir, tmp_path):
    return {"dataset": "synth", "data_path": synth_dataset_dir,
            "checkpoint_dir": str(tmp_path / "saved"),
            "log_dir": str(tmp_path / "log"),
            "epochs": 1, "train_batch_size": 256, "state": "ERROR",
            "scan_epochs": False,
            "load_col": {"inter": ["user_id", "item_id", "rating",
                                   "timestamp"]},
            "threshold": {"rating": 3}}


def test_dataset_negatives_workflow(synth_dataset_dir, tmp_path):
    """Fork labeled workflow (SURVEY §2.9.1): train on the dataset's labeled
    rows as-is, rank against the dataset's own negatives; candidate lists
    narrower than max(topk) exercise the fork's -inf padding fix."""
    r = objective_function(
        config_dict={"model": "MFSimple",
                     **_labeled_base(synth_dataset_dir, tmp_path),
                     "train_use_dataset_negatives": True,
                     "eval_use_dataset_negatives": True}, saved=False)
    tr = r["test_result"]
    assert tr and all(0.0 <= v <= 1.0 for v in tr.values())


def test_bothway_sampler_workflow(synth_dataset_dir, tmp_path):
    """Fork both-ways sampler (custom_dataloaders.py:8-50): positives get k
    sampled negatives, negatives get k/3 sampled pseudo-positives."""
    r = objective_function(
        config_dict={"model": "MFSimple",
                     **_labeled_base(synth_dataset_dir, tmp_path),
                     "train_use_bothway_sampler": True,
                     "training_neg_sample_num": 3}, saved=False)
    assert r["test_result"]


def test_fused_bf16_eval_matches_f32(synth_dataset_dir, tmp_path):
    """The fused full_sort_query eval path (bf16 MXU scoring + id-compare
    hit test) must reproduce the exact-path metrics."""
    base = {"model": "BPR", "dataset": "synth",
            "data_path": synth_dataset_dir,
            "checkpoint_dir": str(tmp_path / "saved"),
            "log_dir": str(tmp_path / "log"),
            "epochs": 2, "state": "ERROR", "scan_epochs": False,
            "seed": 42, "valid_full_to_uni1000": False}
    r1 = objective_function(config_dict=dict(base), saved=False)
    r2 = objective_function(config_dict={**base,
                                         "eval_score_dtype": "bfloat16"},
                            saved=False)
    for k, v in r1["test_result"].items():
        assert abs(v - r2["test_result"][k]) < 0.02, (k, v, r2["test_result"][k])


@pytest.mark.parametrize("model", ["SASRec", "GRU4Rec"])
def test_seq_bf16_training_matches_f32(model, synth_dataset_dir, tmp_path):
    """A/B metric-parity gate for the bfloat16 sequential-tower default
    (compute_dtype: auto resolves to bf16 on TPU): training with explicit
    bf16 towers must land within run-to-run variance of fp32."""
    base = {"model": model, "dataset": "synth",
            "data_path": synth_dataset_dir,
            "checkpoint_dir": str(tmp_path / "saved"),
            "log_dir": str(tmp_path / "log"),
            "epochs": 2, "state": "ERROR",
            "MAX_ITEM_LIST_LENGTH": 20, "train_batch_size": 256,
            "seed": 42, "valid_full_to_uni1000": False}
    r32 = objective_function(config_dict={**base,
                                          "compute_dtype": "float32"},
                             saved=False)
    r16 = objective_function(config_dict={**base,
                                          "compute_dtype": "bfloat16"},
                             saved=False)
    for k, v in r32["test_result"].items():
        assert abs(v - r16["test_result"][k]) < 0.05, \
            (k, v, r16["test_result"][k])


def test_case_study_binds_trained_consts(synth_dataset_dir, tmp_path):
    """case_study must score with the params-carried device constants —
    KGAT rebuilds its dense attention blocks in params['_const'] each epoch,
    and an unbound call would silently use the construction-time values."""
    import jax.numpy as jnp
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer
    from recbole_tpu.utils import case_study

    cfg = Config("KGAT", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log"),
        "epochs": 2, "scan_epochs": False}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, test = data_preparation(cfg, ds)
    model = get_model("KGAT")(cfg, train.dataset)
    trainer = get_trainer(cfg["MODEL_TYPE"], "KGAT")(cfg, model)
    trainer.fit(train, None, verbose=False, saved=False)

    uids = np.array([1, 2, 3])
    got = case_study.full_sort_scores(uids, model, trainer.params, test)
    batch = {cfg["USER_ID_FIELD"]: jnp.asarray(uids)}
    with model.bind_consts(model.consts_of(trainer.params)):
        want = np.asarray(model.full_sort_predict(trainer.params, batch))
    finite = got > case_study.NEG_INF / 2
    np.testing.assert_allclose(got[finite],
                               want[finite.nonzero()[0], finite.nonzero()[1]],
                               rtol=1e-5, atol=1e-6)


def test_fallback_bf16_eval_matches_f32(synth_dataset_dir, tmp_path):
    """The chunked score_items eval fallback (NeuMF-class models without a
    dot-product factorization) must reproduce its f32 metrics when
    eval_score_dtype=bfloat16 casts the per-chunk towers to the MXU, and
    honor the auto-sized chunk budget (eval_pair_bytes)."""
    base = {"model": "NeuMF", "dataset": "synth",
            "data_path": synth_dataset_dir,
            "checkpoint_dir": str(tmp_path / "saved"),
            "log_dir": str(tmp_path / "log"),
            "epochs": 2, "state": "ERROR", "scan_epochs": False,
            "seed": 42, "valid_full_to_uni1000": False}
    r1 = objective_function(config_dict=dict(base), saved=False)
    r2 = objective_function(config_dict={**base,
                                         "eval_score_dtype": "bfloat16"},
                            saved=False)
    for k, v in r1["test_result"].items():
        assert abs(v - r2["test_result"][k]) < 0.02, (k, v, r2["test_result"][k])
