"""Large-scale general-model benchmark at the reference's Yelp / Netflix
shapes vs its published TITAN-RTX seconds/epoch.

Reference tables: asset/time_test_result/General_recommendation.md
  Netflix: 80,476 users / 17,771 items / 2,005,164 interactions (:72-88)
  Yelp:    102,046 users / 98,408 items / 2,905,370 interactions (:123-140)

Usage: python scripts/bench_scale.py [--dataset yelp|netflix] [model ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (train s/ep, eval s/ep); reference OOM rows omitted
REFERENCE = {
    "yelp": {
        "Pop": (3.02, 103.41), "BPR": (6.31, 120.03), "NeuMF": (17.38, 2069.53),
        "NGCF": (908.98, 474.57), "LightGCN": (67.91, 116.16),
        "DMF": (20.84, 1361.71), "GCMC": (None, 299.36),
        # sequential rows: Sequential_recommendation.md:158-176
        "GRU4Rec": (44.31, 2.74), "SASRec": (75.51, 3.11),
        "NARM": (45.65, 2.76), "BERT4Rec": (193.74, 8.43),
        "STAMP": (42.08, 2.72), "FPMC": (21.05, 3.05),
        "Caser": (147.15, 2.89),
    },
    "netflix": {
        "Pop": (2.13, 44.31), "BPR": (4.42, 52.81), "NeuMF": (11.33, 238.92),
        "LightGCN": (30.21, 47.12), "DMF": (12.62, 473.41),
        "FISM": (None, 86.52), "GCMC": (None, 93.15),
    },
}

SHAPES = {
    "yelp": dict(n_users=102_046, n_items=98_408, n_inter=2_905_370),
    "netflix": dict(n_users=80_476, n_items=17_771, n_inter=2_005_164),
}

_DS_CACHE = {}


def synth_dataset(config, shape, seed=42):
    """Post-remap columnar Dataset at the target shape (same trick as
    bench.py — throughput depends on shapes, not values)."""
    from recbole_tpu.data.dataset import Dataset
    from recbole_tpu.data.seq_dataset import SequentialDataset
    from recbole_tpu.utils.enums import FeatureType, FeatureSource, ModelType

    n_users, n_items, n = (shape["n_users"], shape["n_items"],
                           shape["n_inter"])
    rng = np.random.RandomState(seed)
    uids = rng.randint(1, n_users + 1, size=n).astype(np.int32)
    r = rng.random(n)
    iids = (1 + np.floor((n_items - 1) * r ** 2.2)).astype(np.int32)
    ts = np.arange(n, dtype=np.float32)

    cls = (SequentialDataset
           if config["MODEL_TYPE"] is ModelType.SEQUENTIAL else Dataset)
    ds = cls(config, _build=False)
    ds.inter_feat = {"user_id": uids, "item_id": iids, "timestamp": ts}
    ds.field2type = {"user_id": FeatureType.TOKEN,
                     "item_id": FeatureType.TOKEN,
                     "timestamp": FeatureType.FLOAT}
    ds.field2source = {"user_id": FeatureSource.USER_ID,
                       "item_id": FeatureSource.ITEM_ID,
                       "timestamp": FeatureSource.INTERACTION}
    ds.field2id_token = {
        "user_id": np.arange(n_users + 1),
        "item_id": np.arange(n_items + 1),
    }
    ds.field2token_id = {f: {} for f in ds.field2id_token}
    return ds


def bench_model(model, dataset_name, epochs=2):
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer
    from recbole_tpu.utils.utils import init_jax
    import jax

    cfg = Config(model, dataset_name, config_dict={
        "data_path": "/tmp", "state": "ERROR",
        "checkpoint_dir": "/tmp/bench_saved", "log_dir": "/tmp/bench_log",
        "epochs": epochs, "valid_full_to_uni1000": False,
    }, _parse_cmd_line=False)
    init_jax(cfg)
    cache_key = (dataset_name, str(cfg["MODEL_TYPE"]))
    if cache_key not in _DS_CACHE:
        ds = synth_dataset(cfg, SHAPES[dataset_name])
        _DS_CACHE[cache_key] = data_preparation(cfg, ds)
    train, valid, test = _DS_CACHE[cache_key]
    m = get_model(model)(cfg, train.dataset)
    trainer = get_trainer(cfg["MODEL_TYPE"], model)(cfg, m)
    trainer.prepare(train)

    trainer._train_epoch(train, 0)          # compile + warm
    t0 = time.time()
    for ep in range(1, epochs + 1):
        trainer._train_epoch(train, ep)
    jax.block_until_ready(trainer.params)
    train_s = (time.time() - t0) / epochs

    trainer.evaluate(test, load_best_model=False)   # compile
    t0 = time.time()
    trainer.evaluate(test, load_best_model=False)
    eval_s = time.time() - t0
    return train_s, eval_s


def main():
    dataset = "yelp"
    models = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--dataset"):
            if "=" in a:
                dataset = a.split("=", 1)[1]
            else:
                i += 1
                dataset = argv[i]
        else:
            models.append(a)
        i += 1
    models = models or list(REFERENCE[dataset])
    print(f"{'model':<10} {'train s/ep':>10} {'ref':>8} {'x':>6}"
          f" {'eval s/ep':>10} {'ref':>8} {'x':>7}")
    for model in models:
        try:
            tr, ev = bench_model(model, dataset)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{model:<10} FAILED: {str(e)[:90]}")
            continue
        rt, re_ = REFERENCE[dataset].get(model, (None, None))
        rt_s = f"{rt:8.2f}" if rt else "     OOM"
        rx = f"{rt / tr:6.1f}" if rt else "     -"
        re_s = f"{re_:8.2f}" if re_ else "     OOM"
        rex = f"{re_ / ev:7.1f}" if re_ else "      -"
        print(f"{model:<10} {tr:>10.3f} {rt_s} {rx} {ev:>10.3f} {re_s} {rex}")


if __name__ == "__main__":
    main()
