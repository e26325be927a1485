"""Golden-value regression suite (round-5, VERDICT task 9).

The oracle-parity tests pin LOSSES to the reference at init; nothing
pinned end-to-end METRICS across builder changes until now. Each config
below runs the full pipeline on the deterministic CPU path (seeded, tiny
synth dataset) and must reproduce the recorded test-result dict EXACTLY
(the dicts are already rounded to metric_decimal_place, so equality is
meaningful across runs on one jax version). This is the upgrade the
reference's assertion-free smoke suite never had (SURVEY §4).

Regenerate after an INTENTIONAL quality-affecting change with:

    RECBOLE_TPU_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py -q

then review the diff of tests/golden_values.json like any other code
change — an unexplained delta IS the regression this suite exists to
catch. (A jax version bump may legitimately shift values via rng/compiler
changes; regenerate and note it.)
"""

import json
import os

import pytest

from recbole_tpu import objective_function

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_values.json")

_COMMON = {
    "dataset": "synth", "state": "ERROR", "scan_epochs": False,
    "epochs": 2, "train_batch_size": 256, "stopping_step": 10,
    "valid_full_to_uni1000": False, "seed": 2020,
    "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
}

# one per family + the fork paths
CONFIGS = {
    "bpr_general": {"model": "BPR", **_COMMON},
    "sasrec_seq": {"model": "SASRec", **_COMMON,
                   "eval_setting": "TO_LS,full"},
    "gru4rec_uni1000_valid": {"model": "GRU4Rec", **_COMMON,
                              "eval_setting": "TO_LS,full",
                              "valid_full_to_uni1000": True},
    "deepfm_ctr": {"model": "DeepFM", **_COMMON,
                   "threshold": {"rating": 4}, "normalize_all": True,
                   "eval_setting": "RO_RS", "group_by_user": False,
                   "training_neg_sample_num": 0,
                   "metrics": ["AUC", "LogLoss"], "valid_metric": "AUC",
                   "load_col": {
                       "inter": ["user_id", "item_id", "rating",
                                 "timestamp"],
                       "user": ["user_id", "age", "gender"],
                       "item": ["item_id", "genre", "price"]}},
    "kgat_knowledge": {"model": "KGAT", **_COMMON,
                       "load_col": {
                           "inter": ["user_id", "item_id", "rating",
                                     "timestamp"],
                           "kg": ["head_id", "relation_id", "tail_id"],
                           "link": ["item_id", "entity_id"]}},
    "jointsrmf_fork": {"model": "JOINTSRMF", **_COMMON,
                       "threshold": {"rating": 4},
                       "training_neg_sample_num": 2,
                       "item_description_fields": ["genre"],
                       "embedding_dimension": 50,
                       "load_col": {
                           "inter": ["user_id", "item_id", "rating",
                                     "timestamp"],
                           "item": ["item_id", "genre"]}},
    "labeled_negatives_fork": {"model": "MFSimple", **_COMMON,
                               "threshold": {"rating": 3},
                               "epochs": 1,
                               "train_use_dataset_negatives": True,
                               "eval_use_dataset_negatives": True},
    "bothway_sampler_fork": {"model": "MFSimple", **_COMMON,
                             "threshold": {"rating": 3}, "epochs": 1,
                             "train_use_bothway_sampler": True,
                             "training_neg_sample_num": 3},
    "multivae_autoencoder": {"model": "MultiVAE", **_COMMON},
    "itemknn_traditional": {"model": "ItemKNN", **_COMMON},
}


def _load_golden():
    if os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH) as fh:
            return json.load(fh)
    return {}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name, synth_dataset_dir, tmp_path):
    cfg = dict(CONFIGS[name])
    cfg["data_path"] = synth_dataset_dir
    cfg["checkpoint_dir"] = str(tmp_path / "saved")
    cfg["log_dir"] = str(tmp_path / "log")
    result = objective_function(config_dict=cfg, saved=False)
    got = {k: float(v) for k, v in result["test_result"].items()}

    golden = _load_golden()
    if os.environ.get("RECBOLE_TPU_REGEN_GOLDEN"):
        golden[name] = got
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(golden, fh, indent=1, sort_keys=True)
        pytest.skip("regenerated golden values")
    assert name in golden, (
        f"no golden entry for {name} — run with RECBOLE_TPU_REGEN_GOLDEN=1")
    assert got == golden[name], (
        f"{name}: metrics drifted from golden values.\n"
        f"  golden: {golden[name]}\n  got:    {got}\n"
        "If this change is INTENTIONAL, regenerate with "
        "RECBOLE_TPU_REGEN_GOLDEN=1 and review the json diff.")
