"""Per-model smoke matrix: run the FULL pipeline for 1 epoch per model on the
synthetic dataset (parity with reference tests/model/test_model_auto.py,
SURVEY.md §4). Pass = completes and returns sane metrics."""

import pytest

from recbole_tpu import objective_function
from recbole_tpu.models import model_names


BASE = {
    # streaming path keeps per-test CPU compiles small; the scanned-epoch path
    # is covered by tests/test_smoke_bpr.py
    "scan_epochs": False,
    "epochs": 1,
    "train_batch_size": 256,
    "eval_batch_size": 256,
    "state": "ERROR",
    "valid_full_to_uni1000": False,
    "stopping_step": 2,
}

GENERAL_MODELS = ["BPR", "Pop", "ItemKNN", "EASE", "MFSimple", "GMF", "MLP",
                  "NCF", "NeuMF", "LightGCN", "NGCF", "MultiVAE", "MultiDAE",
                  "DMF", "FISM", "NAIS", "SpectralCF", "LINE", "CDAE"]


@pytest.mark.parametrize("model", GENERAL_MODELS)
def test_general_model_smoke(model, synth_dataset_dir, tmp_path):
    result = objective_function(
        config_dict={"model": model, "dataset": "synth",
                     "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     **BASE},
        saved=False)
    tr = result["test_result"]
    assert tr, f"{model} returned empty test result"
    for k, v in tr.items():
        assert 0.0 <= v <= 1.0, f"{model} metric {k}={v} out of range"


def test_all_general_models_registered():
    names = model_names()
    for m in GENERAL_MODELS:
        assert m in names
