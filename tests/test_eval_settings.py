"""Evaluation-protocol matrix (parity: reference tests/evaluation_setting —
{RO_RS, RO_LS, TO_LS} x {full, uni100} on representative models)."""

import pytest

from recbole_tpu import objective_function


BASE = {"dataset": "synth", "epochs": 1, "train_batch_size": 256,
        "state": "ERROR", "scan_epochs": False,
        "valid_full_to_uni1000": False,
        "load_col": {"inter": ["user_id", "item_id", "timestamp"]}}


@pytest.mark.parametrize("setting", ["RO_RS,full", "RO_RS,uni100",
                                     "RO_LS,full", "RO_LS,uni100",
                                     "TO_LS,full", "TO_LS,uni100",
                                     "RO_RS,pop100"])
def test_general_eval_settings(setting, synth_dataset_dir, tmp_path):
    result = objective_function(
        config_dict={"model": "BPR", "eval_setting": setting,
                     "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"), **BASE},
        saved=False)
    tr = result["test_result"]
    assert tr and all(0.0 <= v <= 1.0 for v in tr.values()), (setting, tr)


@pytest.mark.parametrize("setting", ["TO_LS,full", "TO_LS,uni100"])
def test_sequential_eval_settings(setting, synth_dataset_dir, tmp_path):
    result = objective_function(
        config_dict={"model": "GRU4Rec", "eval_setting": setting,
                     "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     "MAX_ITEM_LIST_LENGTH": 20, **BASE},
        saved=False)
    assert result["test_result"]


def test_invalid_valid_metric_rejected(synth_dataset_dir, tmp_path):
    with pytest.raises(ValueError, match="valid_metric"):
        objective_function(
            config_dict={"model": "BPR", "data_path": synth_dataset_dir,
                         "checkpoint_dir": str(tmp_path / "saved"),
                         "log_dir": str(tmp_path / "log"),
                         "metrics": ["Recall", "GAUC"], **BASE},
            saved=False)
