"""Checkpoint / resume tests (parity: reference resume_checkpoint,
trainer.py:208-232 and evaluate(load_best_model))."""

import glob

import numpy as np

from recbole_tpu.config.configurator import Config
from recbole_tpu.data.utils import create_dataset, data_preparation
from recbole_tpu.models import get_model
from recbole_tpu.trainer.trainer import get_trainer


def _pipeline(synth_dataset_dir, tmp_path, epochs):
    cfg = Config("BPR", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log"),
        "epochs": epochs, "scan_epochs": False, "seed": 11,
        "valid_full_to_uni1000": False}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, test = data_preparation(cfg, ds)
    model = get_model("BPR")(cfg, train.dataset)
    trainer = get_trainer(cfg["MODEL_TYPE"], "BPR")(cfg, model)
    return trainer, train, valid, test


def test_resume_checkpoint(synth_dataset_dir, tmp_path):
    trainer, train, valid, test = _pipeline(synth_dataset_dir, tmp_path, 2)
    trainer.fit(train, valid, verbose=False, saved=True)
    ckpts = glob.glob(str(tmp_path / "saved" / "BPR-*.ckpt"))
    assert ckpts

    # fresh trainer resumes epoch counter, params and optimizer state
    trainer2, train2, valid2, test2 = _pipeline(synth_dataset_dir, tmp_path, 4)
    trainer2.resume_checkpoint(ckpts[0])
    assert trainer2.start_epoch >= 1
    assert trainer2.best_valid_score is not None
    score, result = trainer2.fit(train2, valid2, verbose=False, saved=False)
    assert result is not None

    # evaluate(load_best_model) restores the best saved params
    trainer3, train3, valid3, test3 = _pipeline(synth_dataset_dir, tmp_path, 2)
    res = trainer3.evaluate(test3, load_best_model=True, model_file=ckpts[0])
    assert res and all(0.0 <= v <= 1.0 for v in res.values())
