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
                  "DMF", "FISM", "NAIS", "SpectralCF", "LINE", "CDAE",
                  "ConvNCF", "ENMF", "MacridVAE", "RecVAE", "NNCF", "GCMC",
                  "DGCF", "RaCT", "SLIMElastic"]


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


def test_ract_three_stage(synth_dataset_dir, tmp_path):
    """RaCT stage hand-off through pre_model_path checkpoints (parity:
    reference RaCTTrainer 3-stage flow, trainer.py:804-863)."""
    import glob
    base = {"model": "RaCT", "dataset": "synth",
            "data_path": synth_dataset_dir,
            "checkpoint_dir": str(tmp_path / "saved"),
            "log_dir": str(tmp_path / "log"), **BASE}
    objective_function(config_dict={**base, "train_stage": "actor_pretrain"},
                       saved=True)
    ckpts = sorted(glob.glob(str(tmp_path / "saved" / "RaCT-*.ckpt")))
    assert ckpts
    objective_function(config_dict={**base, "train_stage": "critic_pretrain",
                                    "pre_model_path": ckpts[-1]}, saved=True)
    ckpts = sorted(glob.glob(str(tmp_path / "saved" / "RaCT-*.ckpt")))
    result = objective_function(
        config_dict={**base, "train_stage": "finetune",
                     "pre_model_path": ckpts[-1]}, saved=False)
    assert result["test_result"]
