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
    # General_recommendation.md:27-40
    "Pop": (2.11, 8.08),
    "ItemKNN": (2.00, 11.76),
    "BPR": (1.93, 7.43),
    "NeuMF": (4.94, 13.12),
    "DMF": (4.47, 12.63),
    "NAIS": (59.27, 24.41),
    "NGCF": (12.09, 7.12),
    "GCMC": (9.04, 54.15),
    "LightGCN": (7.83, 7.47),
    "DGCF": (181.66, 8.06),
    "ConvNCF": (8.46, 19.60),
    "FISM": (19.30, 10.92),
    "SpectralCF": (13.87, 6.97),
    # Sequential_recommendation.md:26-44
    "GRU4Rec": (7.78, 0.11),
    "SASRec": (17.78, 0.12),
    "NARM": (8.29, 0.11),
    "FPMC": (7.51, 0.11),
    "STAMP": (7.32, 0.11),
    "Caser": (44.85, 0.12),
    "NextItNet": (16433.27, 96.31),
    "TransRec": (10.08, 0.16),
    "GRU4RecF": (10.20, 0.15),
    "SASRecF": (18.84, 0.17),
    "BERT4Rec": (36.09, 0.34),
    "FDSA": (31.86, 0.19),
    "SRGNN": (327.38, 2.19),
    "GCSAN": (335.27, 0.02),
    # Context-aware_recommendation.md:26-42
    "LR": (18.34, 2.18),
    "DSSM": (21.93, 2.24),
    "FM": (19.33, 2.34),
    "DeepFM": (20.42, 2.27),
    "WideDeep": (26.13, 2.95),
    "NFM": (23.36, 2.26),
    "AFM": (20.08, 2.26),
    "AutoInt": (22.41, 2.34),
    "DCN": (28.33, 2.97),
    "FNN": (19.51, 2.21),
    "PNN": (22.29, 2.23),
    "FFM": (22.98, 2.47),
    "FwFM": (23.38, 2.50),
    "xDeepFM": (24.40, 2.30),
    # Knowledge-based_recommendation.md:26-35 (ml-1m, 79K entities, 386K triples)
    "CKE": (3.76, 8.73),
    "KTUP": (3.82, 17.68),
    "RippleNet": (9.39, 13.13),
    "KGAT": (9.59, 8.63),
    "KGNNLS": (4.78, 15.09),
    "KGCN": (2.25, 13.71),
    "MKR": (6.25, 14.89),
    "CFKG": (1.49, 9.76),
}

N_USERS, N_ITEMS, N_INTER = 6040, 3706, 1_000_209

# TPU v5e (v5 lite) single-chip spec peaks; measured ceilings on this chip
# are ~167 TFLOPS bf16 (8192^3 matmul) and ~660-790 GB/s effective stream
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


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
    # item side table (feature-fused models: class token, ml-1m's 5-ish
    # genre vocabulary scale)
    with open(os.path.join(d, "ml1m.item"), "w") as fh:
        fh.write("item_id:token\tclass:token\n")
        cls = rng.randint(1, 19, N_ITEMS)
        np.savetxt(fh, np.stack([np.arange(1, N_ITEMS + 1), cls], axis=1),
                   fmt="%d", delimiter="\t")
    # knowledge graph at the reference's ml-1m KG scale (79K entities /
    # 386K triples / 51 relations, Knowledge-based_recommendation.md:5-9)
    n_ent, n_trip, n_rel = 79388, 385923, 51
    heads = rng.randint(0, n_ent, n_trip)
    tails = rng.randint(0, n_ent, n_trip)
    rels = rng.randint(0, n_rel, n_trip)
    with open(os.path.join(d, "ml1m.kg"), "w") as fh:
        fh.write("head_id:token\trelation_id:token\ttail_id:token\n")
        np.savetxt(fh, np.stack([heads, rels, tails], axis=1),
                   fmt="e%d\tr%d\te%d")
    with open(os.path.join(d, "ml1m.link"), "w") as fh:
        fh.write("item_id:token\tentity_id:token\n")
        ent = rng.choice(n_ent, N_ITEMS, replace=False)
        for i in range(N_ITEMS):
            fh.write(f"{i + 1}\te{ent[i]}\n")
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
    load_col = {"inter": ["user_id", "item_id", "rating", "timestamp"]}
    if model in ("GRU4RecF", "SASRecF", "FDSA", "DIN", "DIEN") \
            or getattr(_gm(model), "type", None) is ModelType.CONTEXT:
        load_col["item"] = ["item_id", "class"]
    cfg = Config(model, "ml1m", config_dict={
        "data_path": data_path, "state": "ERROR",
        "checkpoint_dir": "/tmp/bench_saved", "log_dir": "/tmp/bench_log",
        "epochs": epochs, "valid_full_to_uni1000": False,
        "load_col": load_col,
        "MAX_ITEM_LIST_LENGTH": 50, **extra,
    }, _parse_cmd_line=False)
    from recbole_tpu.utils.utils import init_jax
    init_jax(cfg)
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

    # MFU / HBM utilization from XLA's own cost analysis of the compiled
    # train program (flops exact up to fusion choices; bytes an upper bound
    # that counts VMEM-resident reuse)
    mfu = bw = float("nan")
    ca = trainer.cost_analysis(train)
    if ca:
        ep_flops = ca["flops_per_step"] * ca["steps_per_epoch"]
        ep_bytes = ca["bytes_per_step"] * ca["steps_per_epoch"]
        mfu = ep_flops / train_s / PEAK_FLOPS
        bw = ep_bytes / train_s / PEAK_BW

    trainer.evaluate(test, load_best_model=False)   # compile
    t0 = time.time()
    trainer.evaluate(test, load_best_model=False)
    eval_s = time.time() - t0
    return train_s, eval_s, mfu, bw


def main():
    models = sys.argv[1:] or list(REFERENCE)
    root = synth_ml1m_dir()
    print(f"{'model':<12} {'train s/ep':>10} {'ref':>7} {'x':>6}"
          f" {'MFU%':>6} {'BW%*':>6}"
          f" {'eval s/ep':>10} {'ref':>7} {'x':>7}")
    print("  * BW% = XLA per-op byte sum / (wall x peak HBM BW): an UPPER"
          " BOUND that re-counts VMEM-resident reuse per consuming op, so"
          " >100% means fusion-reuse-dominated, not memory-bound. MFU uses"
          " XLA's flop count (exact up to fusion choices).")
    for model in models:
        try:
            tr, ev, mfu, bw = bench_model(model, root)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{model:<12} FAILED: {str(e)[:80]}")
            continue
        rt, re_ = REFERENCE.get(model, (float("nan"), float("nan")))
        print(f"{model:<12} {tr:>10.3f} {rt:>7.2f} {rt / tr:>6.1f}"
              f" {mfu * 100:>6.1f} {bw * 100:>6.1f}"
              f" {ev:>10.3f} {re_:>7.2f} {re_ / ev:>7.1f}")


if __name__ == "__main__":
    main()
