"""Dataset preprocessing unit tests on handcrafted atomic files
(parity with the reference's tests/data/test_dataset.py tier, SURVEY.md §4)."""

import os

import numpy as np
import pytest

from recbole_tpu.config.configurator import Config
from recbole_tpu.config.eval_setting import EvalSetting
from recbole_tpu.data.dataset import Dataset, PAD_TOKEN


def write_ds(root, name, inter_rows, user_rows=None, item_rows=None,
             inter_header="user_id:token\titem_id:token\trating:float\ttimestamp:float"):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{name}.inter"), "w") as fh:
        fh.write(inter_header + "\n")
        fh.writelines(r + "\n" for r in inter_rows)
    if user_rows:
        with open(os.path.join(d, f"{name}.user"), "w") as fh:
            fh.writelines(r + "\n" for r in user_rows)
    if item_rows:
        with open(os.path.join(d, f"{name}.item"), "w") as fh:
            fh.writelines(r + "\n" for r in item_rows)
    return root


def make_config(root, name, extra=None):
    cfg = {"data_path": root, "state": "ERROR",
           "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]}}
    cfg.update(extra or {})
    return Config("BPR", name, config_dict=cfg, _parse_cmd_line=False)


def test_remap_pad_and_contiguity(tmp_path):
    root = write_ds(str(tmp_path), "ds",
                    ["a\tx\t5\t1", "b\ty\t4\t2", "a\ty\t3\t3"])
    ds = Dataset(make_config(root, "ds"))
    assert ds.field2id_token["user_id"][0] == PAD_TOKEN
    assert ds.user_num == 3  # PAD + a + b
    assert ds.item_num == 3  # PAD + x + y
    # ids follow first occurrence order
    assert ds.token2id("user_id", "a") == 1
    assert ds.token2id("user_id", "b") == 2
    assert ds.token2id_exists("user_id", "zzz") == -1
    np.testing.assert_array_equal(ds.inter_feat["user_id"], [1, 2, 1])
    np.testing.assert_array_equal(ds.inter_feat["item_id"], [1, 2, 2])


def test_value_filter_lowest(tmp_path):
    root = write_ds(str(tmp_path), "ds",
                    ["a\tx\t5\t1", "b\ty\t2\t2", "c\tz\t4\t3"])
    ds = Dataset(make_config(root, "ds", {"lowest_val": {"rating": 3}}))
    assert len(ds) == 2
    assert set(ds.id2token("user_id", ds.inter_feat["user_id"])) == {"a", "c"}


def test_kcore_filtering(tmp_path):
    # u1 has 3 inters, u2 has 1; min_user_inter_num=2 drops u2;
    # then i3 (only u2's item) disappears
    rows = ["u1\ti1\t5\t1", "u1\ti2\t5\t2", "u1\ti1\t4\t3", "u2\ti3\t5\t4"]
    root = write_ds(str(tmp_path), "ds", rows)
    ds = Dataset(make_config(root, "ds", {"min_user_inter_num": 2}))
    assert len(ds) == 3
    assert ds.user_num == 2  # PAD + u1


def test_rm_dup_inter(tmp_path):
    rows = ["u1\ti1\t5\t10", "u1\ti1\t1\t20", "u2\ti1\t3\t5"]
    root = write_ds(str(tmp_path), "ds", rows)
    ds = Dataset(make_config(root, "ds", {"rm_dup_inter": "first"}))
    assert len(ds) == 2
    # keeps the earliest (rating 5) copy
    assert 5.0 in ds.inter_feat["rating"]
    assert 1.0 not in ds.inter_feat["rating"]
    ds2 = Dataset(make_config(root, "ds", {"rm_dup_inter": "last"}))
    assert 1.0 in ds2.inter_feat["rating"]


def test_label_threshold(tmp_path):
    root = write_ds(str(tmp_path), "ds",
                    ["a\tx\t5\t1", "b\ty\t2\t2"])
    ds = Dataset(make_config(root, "ds", {"threshold": {"rating": 4}}))
    np.testing.assert_array_equal(ds.inter_feat["label"], [1.0, 0.0])
    assert "rating" not in ds.inter_feat


def test_normalize(tmp_path):
    root = write_ds(str(tmp_path), "ds",
                    ["a\tx\t1\t1", "b\ty\t3\t2", "c\tz\t5\t3"])
    ds = Dataset(make_config(root, "ds", {"normalize_field": ["rating"]}))
    np.testing.assert_allclose(ds.inter_feat["rating"], [0.0, 0.5, 1.0])


def test_split_by_ratio_grouped(tmp_path):
    rows = [f"u1\ti{j}\t5\t{j}" for j in range(10)] + \
           [f"u2\ti{j}\t5\t{j}" for j in range(5)]
    root = write_ds(str(tmp_path), "ds", rows)
    cfg = make_config(root, "ds", {"eval_setting": "TO_RS,full",
                                   "split_ratio": [0.8, 0.1, 0.1]})
    ds = Dataset(cfg)
    train, valid, test = ds.build(EvalSetting(cfg))
    # u1: 10 -> 8/1/1 ; u2: 5 -> 3/1/1 (tiny parts rounded up, stolen from train)
    assert len(train) == 11 and len(valid) == 2 and len(test) == 2


def test_leave_one_out(tmp_path):
    rows = [f"u1\ti{j}\t5\t{j}" for j in range(5)] + ["u2\ti0\t5\t0"]
    root = write_ds(str(tmp_path), "ds", rows)
    cfg = make_config(root, "ds", {"eval_setting": "TO_LS,full", "leave_one_num": 2})
    ds = Dataset(cfg)
    train, valid, test = ds.build(EvalSetting(cfg))
    # u1: 3 train, 1 valid (i3), 1 test (i4); u2 single inter stays in train
    assert len(train) == 4 and len(valid) == 1 and len(test) == 1
    assert ds.id2token("item_id", valid.inter_feat["item_id"])[0] == "i3"
    assert ds.id2token("item_id", test.inter_feat["item_id"])[0] == "i4"


def test_temporal_ordering_respected(tmp_path):
    rows = ["u1\ti2\t5\t30", "u1\ti1\t5\t10", "u1\ti3\t5\t20"]
    root = write_ds(str(tmp_path), "ds", rows)
    cfg = make_config(root, "ds", {"eval_setting": "TO_LS,full", "leave_one_num": 2})
    ds = Dataset(cfg)
    train, valid, test = ds.build(EvalSetting(cfg))
    # temporal order: i1 (t10) -> train, i3 (t20) -> valid, i2 (t30) -> test
    assert ds.id2token("item_id", test.inter_feat["item_id"])[0] == "i2"


def test_user_feat_alignment(tmp_path):
    user_rows = ["user_id:token\tage:float", "a\t20", "b\t30"]
    root = write_ds(str(tmp_path), "ds",
                    ["a\tx\t5\t1", "b\ty\t4\t2"], user_rows=user_rows)
    cfg = make_config(root, "ds", {
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"],
                     "user": ["user_id", "age"]}})
    ds = Dataset(cfg)
    # row i of user_feat describes user id i
    a_id = ds.token2id("user_id", "a")
    assert ds.user_feat["age"][a_id] == 20.0
    assert ds.user_feat["user_id"][0] == 0  # PAD row


def test_history_matrix(tmp_path):
    rows = ["u1\ti1\t5\t1", "u1\ti2\t5\t2", "u2\ti1\t5\t3"]
    root = write_ds(str(tmp_path), "ds", rows)
    ds = Dataset(make_config(root, "ds"))
    hist, lens = ds.history_item_matrix()
    u1 = ds.token2id("user_id", "u1")
    u2 = ds.token2id("user_id", "u2")
    assert lens[u1] == 2 and lens[u2] == 1
    assert set(hist[u1].tolist()) >= {ds.token2id("item_id", "i1"),
                                      ds.token2id("item_id", "i2")}


def test_inter_matrix(tmp_path):
    rows = ["u1\ti1\t5\t1", "u2\ti2\t3\t2"]
    root = write_ds(str(tmp_path), "ds", rows)
    ds = Dataset(make_config(root, "ds"))
    m = ds.inter_matrix("csr")
    assert m.shape == (ds.user_num, ds.item_num)
    assert m.nnz == 2


def test_benchmark_filename_bypass(tmp_path):
    """Pre-split benchmark files skip filtering/splitting and slice back by
    stored lengths (parity: dataset.py:229-249, 1390-1393)."""
    import numpy as np
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.config.eval_setting import EvalSetting
    from recbole_tpu.data.dataset import Dataset

    d = os.path.join(str(tmp_path), "bm")
    os.makedirs(d)
    hdr = "user_id:token\titem_id:token\trating:float\n"
    parts = {"train": [("u1", "i1"), ("u1", "i2"), ("u2", "i1")],
             "valid": [("u1", "i3")],
             "test": [("u2", "i2")]}
    for part, rows in parts.items():
        with open(os.path.join(d, f"bm.{part}.inter"), "w") as fh:
            fh.write(hdr)
            for u, i in rows:
                fh.write(f"{u}\t{i}\t5\n")
    cfg = Config("BPR", "bm", config_dict={
        "data_path": str(tmp_path), "state": "ERROR",
        "benchmark_filename": ["train", "valid", "test"],
        "load_col": {"inter": ["user_id", "item_id", "rating"]},
    }, _parse_cmd_line=False)
    ds = Dataset(cfg)
    train, valid, test = ds.build(EvalSetting(cfg))
    assert len(train) == 3 and len(valid) == 1 and len(test) == 1
    assert ds.id2token("item_id", np.asarray(valid.inter_feat["item_id"]))[0] == "i3"


def test_dataset_save_load(tmp_path):
    rows = [f"u{u}\ti{i}\t5\t{u * 10 + i}" for u in range(1, 4)
            for i in range(1, 4)]
    root = write_ds(str(tmp_path), "sv", rows)
    cfg = Config("BPR", "sv", config_dict={
        "data_path": root, "state": "ERROR",
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
    }, _parse_cmd_line=False)
    ds = Dataset(cfg)
    out = str(tmp_path / "saved_ds")
    ds.save(out)
    import pickle
    with open(os.path.join(out, "sv-dataset.pkl"), "rb") as fh:
        ds2 = pickle.load(fh)
    assert ds2.user_num == ds.user_num and ds2.inter_num == ds.inter_num
