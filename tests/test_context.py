"""Context/CTR family: value-metric eval path + model smoke."""

import pytest

from recbole_tpu import objective_function

CTR_BASE = {
    "dataset": "synth",
    "epochs": 2, "train_batch_size": 256, "eval_batch_size": 256,
    "state": "ERROR", "scan_epochs": False,
    "threshold": {"rating": 4},
    # raw float features (timestamp, price) are model inputs now — normalize
    # like the reference's CTR protocols (ml-100k.yaml:49) or the magnitudes
    # blow up the towers
    "normalize_all": True,
    "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"],
                 "user": ["user_id", "age", "gender"],
                 "item": ["item_id", "genre", "price"]},
}


@pytest.mark.parametrize("model", ["LR", "FM", "DeepFM", "WideDeep", "DCN", "xDeepFM", "AutoInt", "NFM", "FNN", "AFM", "PNN", "FwFM", "FFM", "DSSM"])
def test_ctr_model_smoke(model, synth_dataset_dir, tmp_path):
    result = objective_function(
        config_dict={"model": model, "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"), **CTR_BASE},
        saved=False)
    tr = result["test_result"]
    assert set(tr) == {"auc", "logloss"}
    assert 0.0 <= tr["auc"] <= 1.0
    assert tr["logloss"] > 0.0


@pytest.mark.parametrize("model", ["LR", "FM", "DeepFM", "xDeepFM"])
def test_ctr_pure_feature_dataset(model, tmp_path):
    """Criteo/Avazu-style protocol: no user/item id columns at all
    (USER_ID_FIELD: ~), label from data, AUC/LogLoss eval (parity: the
    reference's published Criteo config, Context-aware_recommendation.md)."""
    import numpy as np
    d = tmp_path / "criteo" / "criteo"
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    n = 600
    with open(d / "criteo.inter", "w") as fh:
        fh.write("label:float\tI1:float\tI2:float\tC1:token\tC2:token\n")
        for _ in range(n):
            c1, c2 = rng.randint(0, 20), rng.randint(0, 50)
            # learnable signal: label correlates with c1 parity + I1
            x1 = rng.random()
            y = int(x1 + 0.3 * (c1 % 2) + 0.2 * rng.random() > 0.75)
            fh.write(f"{y}\t{x1:.4f}\t{rng.random():.4f}\tc{c1}\tv{c2}\n")
    result = objective_function(
        config_dict={"model": model, "dataset": "criteo",
                     "data_path": str(tmp_path / "criteo"),
                     "USER_ID_FIELD": None, "ITEM_ID_FIELD": None,
                     "LABEL_FIELD": "label", "load_col": {"inter": "*"},
                     "epochs": 2, "train_batch_size": 128,
                     "eval_batch_size": 128, "state": "ERROR",
                     "scan_epochs": False,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log")},
        saved=False)
    tr = result["test_result"]
    assert set(tr) == {"auc", "logloss"}
    assert 0.0 <= tr["auc"] <= 1.0
    assert tr["logloss"] > 0.0


def test_fm_learns_signal(synth_dataset_dir, tmp_path):
    result = objective_function(
        config_dict={"model": "FM", "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     **{**CTR_BASE, "epochs": 30, "stopping_step": 30}},
        saved=False)
    # ratings are random in synth data, but user/item biases exist; just
    # require AUC is finite and the pipeline ran 30 epochs
    assert 0.0 <= result["test_result"]["auc"] <= 1.0

