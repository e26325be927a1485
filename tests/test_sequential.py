"""Sequential pipeline tests: dataset augmentation semantics + model smoke."""

import numpy as np
import pytest

from recbole_tpu import objective_function
from recbole_tpu.config.configurator import Config
from recbole_tpu.config.eval_setting import EvalSetting
from recbole_tpu.data.seq_dataset import SequentialDataset
from tests.test_dataset import write_ds


def test_seq_split_semantics(tmp_path):
    rows = [f"u1\ti{j}\t5\t{j}" for j in range(1, 6)] + ["u2\ti1\t5\t1", "u2\ti2\t5\t2"]
    root = write_ds(str(tmp_path), "ds", rows)
    cfg = Config("GRU4Rec", "ds", config_dict={
        "data_path": root, "state": "ERROR",
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
    }, _parse_cmd_line=False)
    ds = SequentialDataset(cfg)
    train, valid, test = ds.build(EvalSetting(cfg))
    # u1 (5 items -> 4 examples): 2 train, 1 valid, 1 test
    # u2 (2 items -> 1 example): all train
    assert len(train) == 3 and len(valid) == 1 and len(test) == 1
    # test target is u1's LAST item (i5)
    assert ds.id2token("item_id", test.target)[0] == "i5"
    assert ds.id2token("item_id", valid.target)[0] == "i4"
    # test example's window covers i1..i4
    s, l = int(test.start[0]), int(test.length[0])
    window = ds.id2token("item_id", ds.item_stream[s:s + l])
    assert list(window) == ["i1", "i2", "i3", "i4"]


@pytest.mark.parametrize("model", ["GRU4Rec", "SASRec", "STAMP", "FPMC", "NARM", "Caser", "NextItNet", "BERT4Rec", "TransRec", "HRM", "NPE", "FOSSIL", "SHAN", "HGN", "SRGNN", "GCSAN", "RepeatNet"])
def test_sequential_model_smoke(model, synth_dataset_dir, tmp_path):
    result = objective_function(
        config_dict={"model": model, "dataset": "synth",
                     "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     "epochs": 1, "train_batch_size": 256,
                     "state": "ERROR", "scan_epochs": False,
                     "MAX_ITEM_LIST_LENGTH": 20},
        saved=False)
    tr = result["test_result"]
    assert tr and all(0.0 <= v <= 1.0 for v in tr.values())


@pytest.mark.parametrize("model", ["GRU4RecF", "SASRecF", "FDSA", "DIN", "DIEN"])
def test_feature_sequential_model_smoke(model, synth_dataset_dir, tmp_path):
    """Feature-fused and CTR sequential models (item side features loaded via
    the load_col '*' wildcard)."""
    result = objective_function(
        config_dict={"model": model, "dataset": "synth",
                     "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     "epochs": 1, "train_batch_size": 256,
                     "state": "ERROR", "scan_epochs": False,
                     "load_col": {"inter": ["user_id", "item_id", "rating",
                                            "timestamp"], "item": "*"},
                     "MAX_ITEM_LIST_LENGTH": 20},
        saved=False)
    tr = result["test_result"]
    assert tr and all(0.0 <= v <= 1.0 for v in tr.values())


@pytest.mark.parametrize("model", ["GRU4RecKG", "KSR"])
def test_kg_sequential_model_smoke(model, synth_dataset_dir, tmp_path):
    """KG-enhanced sequential models on the KGSeqDataset diamond (random
    entity init fallback — preload path covered below)."""
    result = objective_function(
        config_dict={"model": model, "dataset": "synth",
                     "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     "epochs": 1, "train_batch_size": 256,
                     "state": "ERROR", "scan_epochs": False,
                     "MAX_ITEM_LIST_LENGTH": 20},
        saved=False)
    assert result["test_result"]


def test_preload_weight_gru4reckg(tmp_path):
    """preload_weight pipeline: additional feat file -> entity matrix ->
    frozen entity GRU (parity: dataset.py:423-480 + gru4reckg.py:33,71)."""
    import numpy as np
    from tests.synth_data import make_synthetic_dataset
    root = str(tmp_path / "data")
    ds_dir = make_synthetic_dataset(root, name="synth")
    rng = np.random.RandomState(0)
    with open(f"{ds_dir}/synth.ent", "w") as fh:
        fh.write("ent_id:token\tent_vec:float_seq\n")
        for i in range(1, 101):
            vec = " ".join(f"{v:.4f}" for v in rng.randn(8))
            fh.write(f"e{i}\t{vec}\n")
    result = objective_function(
        config_dict={"model": "GRU4RecKG", "dataset": "synth",
                     "data_path": root,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     "epochs": 1, "train_batch_size": 256, "state": "ERROR",
                     "scan_epochs": False, "MAX_ITEM_LIST_LENGTH": 20,
                     "embedding_size": 8,
                     "additional_feat_suffix": ["ent"],
                     "preload_weight": {"ent_id": "ent_vec"},
                     "load_col": {"inter": ["user_id", "item_id", "rating",
                                            "timestamp"],
                                  "ent": ["ent_id", "ent_vec"]}},
        saved=False)
    assert result["test_result"]


def test_s3rec_two_stage(synth_dataset_dir, tmp_path):
    """S3Rec pretrain -> finetune hand-off (parity: S3RecTrainer,
    trainer.py:511-567)."""
    import glob
    base = {"dataset": "synth", "data_path": synth_dataset_dir,
            "checkpoint_dir": str(tmp_path / "saved"),
            "log_dir": str(tmp_path / "log"),
            "epochs": 1, "train_batch_size": 256, "state": "ERROR",
            "scan_epochs": False, "MAX_ITEM_LIST_LENGTH": 20,
            "load_col": {"inter": ["user_id", "item_id", "rating",
                                   "timestamp"], "item": "*"}}
    objective_function(config_dict={"model": "S3Rec",
                                    "train_stage": "pretrain",
                                    "save_step": 1, **base}, saved=True)
    ck = sorted(glob.glob(str(tmp_path / "saved" / "S3Rec-*.ckpt")))
    assert ck
    result = objective_function(
        config_dict={"model": "S3Rec", "train_stage": "finetune",
                     "pre_model_path": ck[-1], **base}, saved=False)
    assert result["test_result"]


def test_gru4recf_requires_features(synth_dataset_dir, tmp_path):
    with pytest.raises(ValueError, match="item side features"):
        objective_function(
            config_dict={"model": "GRU4RecF", "dataset": "synth",
                         "data_path": synth_dataset_dir,
                         "checkpoint_dir": str(tmp_path / "saved"),
                         "log_dir": str(tmp_path / "log"),
                         "epochs": 1, "state": "ERROR"},
            saved=False)


def test_sasrec_bpr_loss_smoke(synth_dataset_dir, tmp_path):
    result = objective_function(
        config_dict={"model": "SASRec", "dataset": "synth",
                     "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     "epochs": 1, "train_batch_size": 256,
                     "loss_type": "BPR", "training_neg_sample_num": 1,
                     "state": "ERROR", "scan_epochs": False,
                     "MAX_ITEM_LIST_LENGTH": 20},
        saved=False)
    assert result["test_result"]
