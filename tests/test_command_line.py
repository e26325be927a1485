"""Command-line layer tests (parity: reference tests/config/
test_command_line.py invoked through run_test.sh with real --k=v args,
SURVEY.md §4): a real subprocess through run.py, plus Config's cmdline
parsing/priority rules in-process."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_py_subprocess(synth_dataset_dir, tmp_path):
    """run.py end-to-end with typed --k=v args: int, float, scientific
    float, list, eval-protocol string and bool all must coerce."""
    env = dict(os.environ, RECBOLE_TPU_TEST_PLATFORM="cpu",
               JAX_PLATFORMS="cpu",
               # the axon plugin re-forces JAX_PLATFORMS; this one is read
               # by init_jax and applied via jax.config (reliable)
               RECBOLE_TPU_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "--model=BPR", "--dataset=synth",
         f"--data_path={synth_dataset_dir}",
         "--epochs=1", "--train_batch_size=128",
         "--learning_rate=5e-3", "--topk=[5]",
         "--eval_setting=RO_RS,full", "--scan_epochs=False",
         "--valid_metric=MRR@5",
         "--valid_full_to_uni1000=False",
         f"--checkpoint_dir={tmp_path}/saved",
         f"--log_dir={tmp_path}/log"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    text = out.stdout + out.stderr
    assert "recall@5" in text, text[-2000:]
    assert "test result" in text


def test_cmdline_priority_over_dict(synth_dataset_dir, monkeypatch):
    """cmdline > config_dict > yaml defaults (reference configurator.py:
    49-56); unrecognized --args only warn (configurator.py:145-166)."""
    from recbole_tpu.config.configurator import Config
    monkeypatch.setattr(sys, "argv",
                        ["prog", "--epochs=7", "--learning_rate=2e-4",
                         "--alpha=0.25", "--not_a_real_key=1"])
    cfg = Config("JOINTSRMF", "synth",
                 config_dict={"epochs": 3, "data_path": synth_dataset_dir})
    assert cfg["epochs"] == 7                  # cmdline beats dict
    assert cfg["learning_rate"] == pytest.approx(2e-4)
    # the fork's --alpha passthrough (run_recbole.py:21-29)
    assert cfg["alpha"] == pytest.approx(0.25)


def test_cmdline_type_coercion(monkeypatch, synth_dataset_dir):
    from recbole_tpu.config.configurator import Config
    monkeypatch.setattr(sys, "argv",
                        ["prog", "--topk=[1,3]", "--stopping_step=4",
                         "--shuffle=False",
                         '--load_col={"inter": ["user_id", "item_id"]}'])
    cfg = Config("BPR", "synth",
                 config_dict={"data_path": synth_dataset_dir})
    assert cfg["topk"] == [1, 3]
    assert cfg["stopping_step"] == 4
    assert cfg["shuffle"] is False
    assert cfg["load_col"] == {"inter": ["user_id", "item_id"]}
