"""JointSR fork family: joint rec + LM loss models."""

import pytest

from recbole_tpu import objective_function

BASE = {
    "dataset": "synth", "epochs": 1, "train_batch_size": 256,
    "state": "ERROR", "scan_epochs": False, "stopping_step": 2,
    "valid_full_to_uni1000": False,
    "threshold": {"rating": 4},
    "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"],
                 "user": ["user_id", "interests"],
                 "item": ["item_id", "genre"]},
    "item_description_fields": ["genre"],
    "user_description_fields": ["interests"],
    "embedding_dimension": 50,
    "training_neg_sample_num": 2,
}


@pytest.mark.parametrize("model", ["JOINTSRMF", "JOINTSRMFFULL",
                                   "JOINTSRMFSPARSE", "JOINTSRMFNEGS",
                                   "JOINTSR", "JOINTSRMLPSPARSE",
                                   "JOINTSRUSERMF"])
def test_jointsr_smoke(model, synth_dataset_dir, tmp_path):
    result = objective_function(
        config_dict={"model": model, "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"), **BASE},
        saved=False)
    tr = result["test_result"]
    assert tr and all(0.0 <= v <= 1.0 for v in tr.values())
