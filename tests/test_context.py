"""Context/CTR family: value-metric eval path + model smoke."""

import pytest

from recbole_tpu import objective_function

CTR_BASE = {
    "dataset": "synth",
    "epochs": 2, "train_batch_size": 256, "eval_batch_size": 256,
    "state": "ERROR", "scan_epochs": False,
    "threshold": {"rating": 4},
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
