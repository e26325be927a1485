"""Overall-config parameter sweep (parity: tests/config/test_overall.py in
the reference, which value-sweeps overall.yaml keys by actually running BPR
for one epoch and asserting no exception). Here each knob additionally gets
a behavior assertion where one is cheap to make."""

import glob
import os

import pytest

from recbole_tpu import objective_function


def _run(synth_dataset_dir, tmp_path, **overrides):
    cfg = {"model": "BPR", "dataset": "synth",
           "data_path": synth_dataset_dir,
           "checkpoint_dir": str(tmp_path / "saved"),
           "log_dir": str(tmp_path / "log"),
           "epochs": 1, "state": "ERROR", "scan_epochs": False,
           "valid_full_to_uni1000": False}
    cfg.update(overrides)
    return objective_function(config_dict=cfg, saved=False)


@pytest.mark.parametrize("overrides", [
    {"learner": "sgd"},
    {"learner": "adagrad"},
    {"learner": "rmsprop"},
    {"learner": "sparse_adam"},          # maps to adam on TPU (dense tables)
    {"weight_decay": 1e-4},
    {"clip_grad_norm": {"max_norm": 5.0}},
    {"training_neg_sample_num": 4},
    {"training_neg_sample_distribution": "popularity"},
    {"train_batch_size": 128},
    {"eval_batch_size": 256},
    {"topk": [1, 5, 10], "valid_metric": "Recall@5"},
    {"metrics": ["Recall"], "topk": [3], "valid_metric": "Recall@3"},
    {"metric_decimal_place": 2},
    {"reproducibility": False},
    {"epochs": 0},                       # eval-only degenerate loop
], ids=lambda o: next(iter(o.items()))[0] + "=" +
    str(next(iter(o.items()))[1]))
def test_overall_param_runs(overrides, synth_dataset_dir, tmp_path):
    result = _run(synth_dataset_dir, tmp_path, **overrides)
    assert isinstance(result["test_result"], dict)
    if overrides.get("epochs") != 0:
        assert result["test_result"]


def test_eval_step_cadence(synth_dataset_dir, tmp_path):
    """eval_step=2 over 4 epochs: early-stopping counters advance on
    validation epochs only; the run completes with a best score."""
    result = _run(synth_dataset_dir, tmp_path, epochs=4, eval_step=2)
    assert result["best_valid_score"] is not None


def test_stopping_step_halts(synth_dataset_dir, tmp_path):
    """A hostile valid metric (smaller-is-better RMSE won't improve under
    BPR training) with patience 1 must stop long before 50 epochs."""
    import time
    t0 = time.time()
    result = _run(synth_dataset_dir, tmp_path, epochs=50, stopping_step=1,
                  learning_rate=0.0)
    assert result["best_valid_score"] is not None
    assert time.time() - t0 < 120  # early stop, not 50 full epochs


def test_draw_loss_pic(synth_dataset_dir, tmp_path):
    _run(synth_dataset_dir, tmp_path, epochs=2, draw_loss_pic=True,
         checkpoint_dir=str(tmp_path / "saved_pic"))
    assert glob.glob(str(tmp_path / "saved_pic" / "*.pdf"))


def test_logfile_written(synth_dataset_dir, tmp_path):
    _run(synth_dataset_dir, tmp_path, state="INFO",
         log_dir=str(tmp_path / "log_written"))
    files = glob.glob(str(tmp_path / "log_written" / "*.log"))
    assert files and os.path.getsize(files[0]) > 0
