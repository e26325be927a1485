"""DecisionTreeTrainer executed for real against fake xgboost/lightgbm.

Neither external lib ships in this image, so the trainer's native-train
bridge (one-hot conversion, DMatrix/Dataset construction, early-stopping
arguments, booster save/reload, ValueCollector hand-off — reference
trainer.py:610-935) previously ran only by inspection. These fakes implement
exactly the surface the trainer touches and record the calls, so the whole
fit/evaluate body executes under pytest.
"""

import json
import sys
import types

import numpy as np
import pytest

from recbole_tpu.config.configurator import Config
from recbole_tpu.data.utils import create_dataset, data_preparation
from recbole_tpu.models import get_model
from recbole_tpu.trainer.trainer import get_trainer


# ----------------------------------------------------------- fake xgboost

class _FakeDMatrix:
    def __init__(self, data, label=None, missing=None):
        import scipy.sparse as sp
        self.sparse = sp.issparse(data)
        self.data = np.asarray(data.todense()) if self.sparse \
            else np.asarray(data)
        self.label = None if label is None else np.asarray(label)
        self.missing = missing


class _FakeXgbBooster:
    def __init__(self, model_file=None):
        self.mean = 0.5
        if model_file is not None:
            self.load_model(model_file)

    def predict(self, dmat):
        x = dmat.data
        s = x.sum(axis=1)
        return np.clip(self.mean + 0.05 * np.tanh(s - s.mean()), 1e-3,
                       1 - 1e-3)

    def save_model(self, path):
        with open(path, "w") as fh:
            json.dump({"mean": self.mean}, fh)

    def load_model(self, path):
        with open(path) as fh:
            self.mean = json.load(fh)["mean"]


def _fake_xgb(calls):
    mod = types.ModuleType("xgboost")
    mod.DMatrix = _FakeDMatrix
    mod.Booster = _FakeXgbBooster

    def train(params, dtrain, num_boost_round=10, evals=(),
              early_stopping_rounds=None, verbose_eval=None):
        calls.append({"params": params, "rounds": num_boost_round,
                      "evals": [name for _, name in evals],
                      "early": early_stopping_rounds,
                      "n_features": dtrain.data.shape[1],
                      "sparse_input": dtrain.sparse})
        b = _FakeXgbBooster()
        b.mean = float(dtrain.label.mean())
        return b

    mod.train = train
    return mod


# ---------------------------------------------------------- fake lightgbm

class _FakeLgbDataset:
    def __init__(self, data, label=None, reference=None):
        import scipy.sparse as sp
        self.data = np.asarray(data.todense()) if sp.issparse(data) \
            else np.asarray(data)
        self.label = None if label is None else np.asarray(label)
        self.reference = reference


class _FakeLgbBooster(_FakeXgbBooster):
    def predict(self, X):  # lgb predicts on raw matrices
        import scipy.sparse as sp
        x = np.asarray(X.todense()) if sp.issparse(X) else np.asarray(X)
        s = x.sum(axis=1)
        return np.clip(self.mean + 0.05 * np.tanh(s - s.mean()), 1e-3,
                       1 - 1e-3)


def _fake_lgb(calls):
    mod = types.ModuleType("lightgbm")
    mod.Dataset = _FakeLgbDataset
    mod.Booster = lambda model_file=None: _FakeLgbBooster(model_file)

    def early_stopping(rounds):
        return ("early_stopping", rounds)

    def train(params, dtrain, num_boost_round=10, valid_sets=(),
              callbacks=()):
        calls.append({"params": params, "rounds": num_boost_round,
                      "n_valid_sets": len(valid_sets),
                      "callbacks": list(callbacks)})
        b = _FakeLgbBooster()
        b.mean = float(dtrain.label.mean())
        return b

    mod.early_stopping = early_stopping
    mod.train = train
    return mod


# ------------------------------------------------------------------ tests

def _pipeline(model_name, synth_dataset_dir, tmp_path, extra=None):
    cfg = Config(model_name, "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log"),
        "USER_ID_FIELD": "user_id", "ITEM_ID_FIELD": "item_id",
        "LABEL_FIELD": "label", "threshold": {"rating": 3},
        "metrics": ["AUC", "LogLoss"], "valid_metric": "AUC",
        "eval_setting": "RO_RS", "group_by_user": False,
        "training_neg_sample_num": 0,
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        **(extra or {}),
    }, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, test = data_preparation(cfg, ds)
    model = get_model(model_name)(cfg, train.dataset)
    trainer = get_trainer(cfg["MODEL_TYPE"], model_name)(cfg, model)
    return cfg, trainer, train, valid, test


def test_xgboost_trainer_runs(synth_dataset_dir, tmp_path, monkeypatch):
    calls = []
    monkeypatch.setitem(sys.modules, "xgboost", _fake_xgb(calls))
    cfg, trainer, train, valid, test = _pipeline(
        "xgboost", synth_dataset_dir, tmp_path,
        {"xgb_num_boost_round": 7, "xgb_early_stopping_rounds": 3})
    score, result = trainer.fit(train, valid)
    assert len(calls) == 1
    assert calls[0]["rounds"] == 7
    assert calls[0]["early"] == 3
    assert calls[0]["evals"] == ["train", "valid"]
    assert calls[0]["params"]["objective"] == "binary:logistic"
    assert 0.0 <= result["auc"] <= 1.0 and result["logloss"] > 0
    assert 0.0 <= score <= 1.0
    test_result = trainer.evaluate(test, load_best_model=False)
    assert set(test_result) == {"auc", "logloss"}

    # booster save/reload: a FRESH trainer evaluates from the model file
    _, trainer2, _, _, _ = _pipeline(
        "xgboost", synth_dataset_dir, tmp_path)
    reloaded = trainer2.evaluate(test, load_best_model=True,
                                 model_file=trainer.saved_model_file)
    assert reloaded == pytest.approx(test_result, abs=1e-9)


def test_xgboost_onehot_conversion(synth_dataset_dir, tmp_path, monkeypatch):
    """convert_token_to_onehot widens token columns below the threshold
    into sparse one-hot blocks (reference DecisionTreeDataset
    _judge_token_and_convert, decisiontree_dataset.py:26)."""
    calls = []
    monkeypatch.setitem(sys.modules, "xgboost", _fake_xgb(calls))
    cfg, trainer, train, valid, test = _pipeline(
        "xgboost", synth_dataset_dir, tmp_path,
        {"convert_token_to_onehot": True, "token_num_threshold": 10_000})
    trainer.fit(train, valid)
    n_users = train.dataset.user_num
    n_items = train.dataset.item_num
    assert calls[0]["sparse_input"]
    # user_id + item_id one-hot blocks + the float columns
    assert calls[0]["n_features"] >= n_users + n_items


def test_lightgbm_trainer_runs(synth_dataset_dir, tmp_path, monkeypatch):
    calls = []
    monkeypatch.setitem(sys.modules, "lightgbm", _fake_lgb(calls))
    cfg, trainer, train, valid, test = _pipeline(
        "lightgbm", synth_dataset_dir, tmp_path,
        {"lgb_num_boost_round": 5, "lgb_early_stopping_rounds": 2})
    score, result = trainer.fit(train, valid)
    assert len(calls) == 1
    assert calls[0]["rounds"] == 5
    assert calls[0]["n_valid_sets"] == 2
    assert ("early_stopping", 2) in calls[0]["callbacks"]
    assert 0.0 <= result["auc"] <= 1.0 and result["logloss"] > 0
    test_result = trainer.evaluate(test, load_best_model=False)
    assert set(test_result) == {"auc", "logloss"}
