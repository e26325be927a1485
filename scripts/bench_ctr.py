"""CTR-family benchmark at the reference's Criteo / Avazu scales.

Reference tables: asset/time_test_result/Context-aware_recommendation.md
  Criteo: 2,292,530 interactions, 39 fields (13 float + 26 token),
          2,572,192 total features   (:44-60)
  Avazu:  4,218,938 interactions, 21 token fields, 1,326,631 features (:70-86)
Protocol (reference config blocks in the same file): USER_ID_FIELD: ~,
ITEM_ID_FIELD: ~, LABEL_FIELD: label, load_col inter '*', RO_RS ungrouped,
AUC/LogLoss value metrics. TITAN RTX 24GB numbers.

We synthesize datasets with those exact shapes (power-law token frequencies)
directly as post-remap columnar arrays — throughput depends on shapes, not
values. Usage:

    python scripts/bench_ctr.py [--dataset criteo|avazu] [model ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# reference (train s/ep, eval s/ep); '-' / OOM rows omitted
REFERENCE = {
    "criteo": {
        "LR": (7.65, 0.61), "FM": (9.77, 0.73), "DeepFM": (13.64, 0.83),
        "WideDeep": (13.58, 0.80), "NFM": (13.36, 0.75), "AFM": (19.40, 1.02),
        "AutoInt": (19.40, 0.98), "DCN": (16.25, 0.78), "FNN": (10.03, 0.64),
        "PNN": (12.92, 0.72), "FwFM": (1175.24, 8.90), "xDeepFM": (32.27, 1.34),
        "FFM": (float("nan"), float("nan")),  # reference: Out of Memory (24GB)
    },
    "avazu": {
        "LR": (9.30, 0.76), "FM": (25.68, 0.94), "DeepFM": (28.41, 1.19),
        "WideDeep": (27.58, 0.97), "NFM": (30.46, 1.06), "AFM": (31.03, 1.06),
        "AutoInt": (38.11, 1.41), "DCN": (30.78, 0.96), "FNN": (23.53, 0.84),
        "PNN": (25.86, 0.90), "FwFM": (336.75, 7.49), "xDeepFM": (54.88, 1.45),
        "FFM": (float("nan"), float("nan")),  # reference: Out of Memory (24GB)
    },
}

SHAPES = {
    # n_rows, n_float_fields, token vocab per field (sums to the reference's
    # total feature count; Criteo-like skew: a few huge fields, many small)
    "criteo": dict(
        n=2_292_530, n_float=13,
        vocabs=[1_200_000, 530_000, 310_000, 190_000, 120_000, 80_000, 50_000,
                30_000, 20_000, 12_000, 8_000, 5_000, 3_000, 2_000, 1_500,
                1_000, 800, 600, 500, 400, 300, 200, 150, 100, 80, 62],
    ),
    "avazu": dict(
        n=4_218_938, n_float=0,
        vocabs=[700_000, 320_000, 150_000, 70_000, 35_000, 18_000, 9_000,
                5_000, 3_000, 2_500, 2_000, 1_500, 1_200, 1_000, 800, 600,
                500, 400, 300, 200, 131],
    ),
}


_COLUMN_CACHE = {}
_LOADER_CACHE = {}


def _synth_columns(shape, seed=42):
    """Raw column synthesis, cached — 2-4M-row RNG costs ~30s, identical
    across the models benchmarked on one dataset."""
    key = (id(shape), seed)
    if key not in _COLUMN_CACHE:
        rng = np.random.RandomState(seed)
        n = shape["n"]
        cols = {"label": (rng.random(n) < 0.25).astype(np.float32)}
        for j in range(shape["n_float"]):
            cols[f"I{j + 1}"] = rng.random(n).astype(np.float32)
        for j, vocab in enumerate(shape["vocabs"]):
            # power-law token frequencies via inverse-CDF; 1..vocab-1 (0=PAD)
            r = rng.random(n)
            cols[f"C{j + 1}"] = (
                1 + np.floor((vocab - 2) * r ** 3.0)).astype(np.int32)
        _COLUMN_CACHE[key] = cols
    return _COLUMN_CACHE[key]


def synth_ctr_dataset(config, shape, seed=42):
    """Build the post-remap columnar Dataset directly (same trick as
    bench.py's synth ml-1m — no atomic-file round trip at 2-4M rows)."""
    from recbole_tpu.data.dataset import Dataset
    from recbole_tpu.utils.enums import FeatureType, FeatureSource

    cols = _synth_columns(shape, seed)
    ds = Dataset(config, _build=False)
    ds.inter_feat = dict(cols)
    ds.field2type = {"label": FeatureType.FLOAT}
    ds.field2source = {"label": FeatureSource.INTERACTION}
    for j in range(shape["n_float"]):
        f = f"I{j + 1}"
        ds.field2type[f] = FeatureType.FLOAT
        ds.field2source[f] = FeatureSource.INTERACTION
    for j, vocab in enumerate(shape["vocabs"]):
        f = f"C{j + 1}"
        ds.field2type[f] = FeatureType.TOKEN
        ds.field2source[f] = FeatureSource.INTERACTION
        # lightweight vocab stand-in: len() drives num(); values unused here
        ds.field2id_token[f] = np.arange(vocab)
        ds.field2token_id[f] = {}
    return ds


def bench_model(model, dataset_name, epochs=2, config_overrides=None):
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer
    import jax

    cfg = Config(model, dataset_name, config_dict={
        "data_path": "/tmp", "state": "ERROR",
        "checkpoint_dir": "/tmp/bench_saved", "log_dir": "/tmp/bench_log",
        "epochs": epochs,
        "USER_ID_FIELD": None, "ITEM_ID_FIELD": None, "LABEL_FIELD": "label",
        "TIME_FIELD": None, **(config_overrides or {}),
    }, _parse_cmd_line=False)
    # the data protocol (ungrouped RO_RS split, value metrics) is identical
    # for every CTR model — split once per dataset, reuse the loader triple
    if dataset_name not in _LOADER_CACHE:
        ds = synth_ctr_dataset(cfg, SHAPES[dataset_name])
        _LOADER_CACHE[dataset_name] = data_preparation(cfg, ds)
    train, valid, test = _LOADER_CACHE[dataset_name]
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
    dataset = "criteo"
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
        elif not a.startswith("--"):
            models.append(a)
        i += 1
    models = models or list(REFERENCE[dataset])
    print(f"== {dataset} shape: {SHAPES[dataset]['n']:,} rows, "
          f"{SHAPES[dataset]['n_float']} float + "
          f"{len(SHAPES[dataset]['vocabs'])} token fields, "
          f"{sum(SHAPES[dataset]['vocabs']):,} features ==")
    print(f"{'model':<10} {'train s/ep':>10} {'ref':>8} {'x':>7}"
          f" {'eval s/ep':>10} {'ref':>6} {'x':>6}")
    for model in models:
        try:
            tr, ev = bench_model(model, dataset)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{model:<10} FAILED: {str(e)[:100]}")
            continue
        rt, re_ = REFERENCE[dataset].get(model, (float("nan"), float("nan")))
        print(f"{model:<10} {tr:>10.3f} {rt:>8.2f} {rt / tr:>7.1f}"
              f" {ev:>10.3f} {re_:>6.2f} {re_ / ev:>6.1f}")


if __name__ == "__main__":
    main()
