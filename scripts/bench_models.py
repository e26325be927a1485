"""Multi-model throughput benchmark at ml-1m shape vs the reference's
published TITAN-RTX seconds/epoch (BASELINE.md tables).

Usage: python scripts/bench_models.py [model ...]
Prints one table row per model: train s/epoch, eval s/epoch, vs-reference.
(bench.py stays the driver's single-line benchmark; this is the wide table.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# reference train/eval s-per-epoch on ml-1m (BASELINE.md, General/Sequential/
# Context tables)
REFERENCE = {
    "BPR": (1.93, 7.43),
    "NeuMF": (4.94, 13.12),
    "LightGCN": (7.83, 7.47),
    "NGCF": (12.09, 7.12),
    "DMF": (4.47, 12.63),
    "SpectralCF": (13.87, 6.97),
    "GRU4Rec": (7.78, 0.11),
    "SASRec": (17.78, 0.12),
    "DeepFM": (20.42, 2.27),
}

N_USERS, N_ITEMS, N_INTER = 6040, 3706, 1_000_209


def synth_ml1m_dir(root="/tmp/bench_ml1m_synth"):
    """ml-1m-shaped atomic files (written once, reused)."""
    d = os.path.join(root, "ml1m")
    marker = os.path.join(d, "ml1m.inter")
    if os.path.isfile(marker):
        return root
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(42)
    uids = rng.randint(1, N_USERS + 1, size=N_INTER)
    r = rng.random(N_INTER)
    iids = 1 + np.floor((N_ITEMS - 1) * r ** 2.2).astype(np.int64)
    ts = np.arange(N_INTER)
    with open(marker, "w") as fh:
        fh.write("user_id:token\titem_id:token\trating:float\ttimestamp:float\n")
        np.savetxt(fh, np.stack([uids, iids, rng.randint(1, 6, N_INTER), ts],
                                axis=1), fmt="%d", delimiter="\t")
    return root


def bench_model(model, data_path, epochs=3):
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer
    import jax

    from recbole_tpu.utils.enums import ModelType
    from recbole_tpu.models import get_model as _gm
    extra = {}
    if getattr(_gm(model), "type", None) is ModelType.CONTEXT:
        extra["threshold"] = {"rating": 3}  # CTR protocols need labels
    cfg = Config(model, "ml1m", config_dict={
        "data_path": data_path, "state": "ERROR",
        "checkpoint_dir": "/tmp/bench_saved", "log_dir": "/tmp/bench_log",
        "epochs": epochs, "valid_full_to_uni1000": False,
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        "MAX_ITEM_LIST_LENGTH": 50, **extra,
    }, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, test = data_preparation(cfg, ds)
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
    models = sys.argv[1:] or list(REFERENCE)
    root = synth_ml1m_dir()
    print(f"{'model':<12} {'train s/ep':>10} {'ref':>7} {'x':>6}"
          f" {'eval s/ep':>10} {'ref':>7} {'x':>7}")
    for model in models:
        try:
            tr, ev = bench_model(model, root)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{model:<12} FAILED: {str(e)[:80]}")
            continue
        rt, re_ = REFERENCE.get(model, (float("nan"), float("nan")))
        print(f"{model:<12} {tr:>10.3f} {rt:>7.2f} {rt / tr:>6.1f}"
              f" {ev:>10.3f} {re_:>7.2f} {re_ / ev:>7.1f}")


if __name__ == "__main__":
    main()
