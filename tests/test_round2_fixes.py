"""Round-2 behavioral fixes (VERDICT items 5-9).

Covers: strict early-stopping improvement (reference utils.py:123),
checkpointed patience counter (reference trainer.py:191-232), dense-user
sampling guard (reference sampler.py:220-226), the generic <Model>Dataset
registry hook (reference customized_dataset.py:17-26), and the stable
eval-step cache key.
"""

import glob
import pickle

import numpy as np
import pytest

from recbole_tpu.config.configurator import Config
from recbole_tpu.data.utils import (create_dataset, data_preparation,
                                    register_dataset, DATASET_REGISTRY)
from recbole_tpu.data.dataset import Dataset
from recbole_tpu.models import get_model
from recbole_tpu.sampler.sampler import PhaseHistory
from recbole_tpu.trainer.trainer import get_trainer
from recbole_tpu.utils.utils import early_stopping


# ---------------------------------------------------------- early stopping

def test_early_stopping_plateau_consumes_patience():
    """A tied metric is NOT an improvement (reference requires strict >):
    patience advances and no re-checkpoint is signalled."""
    best, cur, stop, update = early_stopping(0.5, None, 0, 2)
    assert update and best == 0.5 and cur == 0
    # plateau: same value repeatedly -> stops after stopping_step validations
    best, cur, stop, update = early_stopping(0.5, best, cur, 2)
    assert not update and cur == 1 and not stop
    best, cur, stop, update = early_stopping(0.5, best, cur, 2)
    assert not update and cur == 2 and not stop
    best, cur, stop, update = early_stopping(0.5, best, cur, 2)
    assert not update and cur == 3 and stop
    # strict improvement resets
    best, cur, stop, update = early_stopping(0.6, 0.5, 3, 2)
    assert update and best == 0.6 and cur == 0


def test_early_stopping_smaller_is_better_strict():
    best, cur, stop, update = early_stopping(0.4, 0.4, 0, 1, bigger=False)
    assert not update and cur == 1
    best, cur, stop, update = early_stopping(0.3, 0.4, 1, 1, bigger=False)
    assert update and best == 0.3 and cur == 0


# ------------------------------------------------------- checkpoint resume

def _pipeline(synth_dataset_dir, tmp_path, epochs, stopping_step=10):
    cfg = Config("BPR", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log"),
        "epochs": epochs, "scan_epochs": False, "seed": 11,
        "stopping_step": stopping_step,
        "valid_full_to_uni1000": False}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, test = data_preparation(cfg, ds)
    model = get_model("BPR")(cfg, train.dataset)
    trainer = get_trainer(cfg["MODEL_TYPE"], "BPR")(cfg, model)
    return trainer, train, valid, test


def test_resume_restores_patience_and_loss_curve(synth_dataset_dir, tmp_path):
    trainer, train, valid, test = _pipeline(synth_dataset_dir, tmp_path, 3)
    trainer.fit(train, valid, verbose=False, saved=True)
    ckpts = glob.glob(str(tmp_path / "saved" / "BPR-*.ckpt"))
    assert ckpts
    with open(ckpts[0], "rb") as fh:
        state = pickle.load(fh)
    assert "cur_step" in state and "train_loss_dict" in state
    assert state["train_loss_dict"]  # loss curve persisted

    trainer2, train2, valid2, _ = _pipeline(synth_dataset_dir, tmp_path, 5)
    trainer2.resume_checkpoint(ckpts[0])
    assert trainer2.cur_step == state["cur_step"]
    assert trainer2.train_loss_dict == state["train_loss_dict"]


# ------------------------------------------------------- dense-user guard

def test_dense_user_guard_raises():
    """A user who interacted with every item cannot be sampled against."""
    n_items = 5  # ids 1..4 real
    uids = np.array([1, 1, 1, 1], np.int64)
    iids = np.array([1, 2, 3, 4], np.int64)
    ph = PhaseHistory(3, n_items, {"train": (uids, iids)})
    with pytest.raises(ValueError, match="interacted with all"):
        ph.assert_sampleable("train")


def test_sparse_user_guard_passes():
    ph = PhaseHistory(3, 5, {"train": (np.array([1, 2]), np.array([1, 2]))})
    ph.assert_sampleable("train")  # no raise


def test_trainer_raises_for_dense_user(tmp_path):
    """End-to-end: a tiny dataset where one user interacted with all items
    fails at train-step construction, not silently."""
    import os
    d = tmp_path / "dense"
    os.makedirs(d / "dense")
    rows = ["user_id:token\titem_id:token\trating:float\ttimestamp:float"]
    # every user interacts with all 3 items 4x each: with a 0.8/0.1/0.1 split
    # only ~3 of 12 rows leave train, so train deterministically covers all
    # 3 distinct items for every user
    t = 0
    for u in ("A", "B", "C"):
        for rep in range(4):
            for i in ("i1", "i2", "i3"):
                t += 1
                rows.append(f"{u}\t{i}\t5.0\t{t}")
    (d / "dense" / "dense.inter").write_text("\n".join(rows) + "\n")
    cfg = Config("BPR", "dense", config_dict={
        "data_path": str(d), "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log"),
        "epochs": 1, "scan_epochs": False,
        "valid_full_to_uni1000": False}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, test = data_preparation(cfg, ds)
    model = get_model("BPR")(cfg, train.dataset)
    trainer = get_trainer(cfg["MODEL_TYPE"], "BPR")(cfg, model)
    with pytest.raises(ValueError, match="interacted with all"):
        trainer.fit(train, valid, verbose=False, saved=False)


# -------------------------------------------------------- dataset registry

def test_custom_dataset_registered_by_model_name(synth_dataset_dir, tmp_path):
    calls = []

    @register_dataset("BPR")
    class BPRDataset(Dataset):
        def __init__(self, config):
            calls.append("hit")
            super().__init__(config)

    try:
        cfg = Config("BPR", "synth", config_dict={
            "data_path": synth_dataset_dir, "state": "ERROR",
            "log_dir": str(tmp_path / "log")}, _parse_cmd_line=False)
        ds = create_dataset(cfg)
        assert calls == ["hit"]
        assert type(ds).__name__ == "BPRDataset"
    finally:
        DATASET_REGISTRY.pop("BPR", None)


def test_builtin_kg_seq_dataset_still_dispatches(synth_dataset_dir, tmp_path):
    from recbole_tpu.data.kg_seq_dataset import KGSeqDataset
    cfg = Config("KSR", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "log_dir": str(tmp_path / "log")}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    assert isinstance(ds, KGSeqDataset)


# ------------------------------------------------------ eval-step cache key

def test_eval_cache_not_keyed_on_object_id(synth_dataset_dir, tmp_path):
    """Two same-shaped loaders created back-to-back (second may reuse the
    first's recycled id()) must not alias each other's jitted step."""
    trainer, train, valid, test = _pipeline(synth_dataset_dir, tmp_path, 1)
    trainer.fit(train, valid, verbose=False, saved=False)
    r1 = trainer.evaluate(test, load_best_model=False)
    token1 = test._trainer_cache_token
    del test
    import gc
    gc.collect()
    # rebuild an identically-shaped loader; id() may be recycled
    _, _, _, test2 = _pipeline(synth_dataset_dir, tmp_path, 1)
    r2 = trainer.evaluate(test2, load_best_model=False)
    token2 = test2._trainer_cache_token
    assert token1[1] != token2[1]
    assert set(r1) == set(r2)
