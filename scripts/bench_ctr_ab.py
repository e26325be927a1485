"""Criteo scatter-story A/B (round-4 VERDICT task 4).

Four cells — {adam, sparse_adam} x {dedup-gather backward ON, OFF} — at the
reference's exact Criteo shape, DeepFM and FM, each 1 warm + 3 timed epochs,
plus an HLO audit: the compiled loss-grad module is grepped for scatter ops
in each dedup mode, so "the scatter disappears from the HLO" is a checked
claim, not an assertion.

Run serialized on the TPU (one process at a time):

    python scripts/bench_ctr_ab.py [FM DeepFM]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def hlo_scatter_audit(model_name, dataset_name="criteo"):
    """Count scatter/segment ops in the compiled loss-grad HLO for both
    dedup modes. Returns {mode: {"scatter": n, "sort": n}}."""
    import jax
    import jax.numpy as jnp
    import bench_ctr
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import data_preparation
    from recbole_tpu.models import get_model

    out = {}
    for mode in ("dedup", "scatter"):
        os.environ.pop("RECBOLE_TPU_DEDUP_GATHER", None)
        if mode == "dedup":
            os.environ["RECBOLE_TPU_DEDUP_GATHER"] = "1"
        cfg = Config(model_name, dataset_name, config_dict={
            "data_path": "/tmp", "state": "ERROR",
            "checkpoint_dir": "/tmp/bench_saved", "log_dir": "/tmp/bench_log",
            "USER_ID_FIELD": None, "ITEM_ID_FIELD": None,
            "LABEL_FIELD": "label", "TIME_FIELD": None,
        }, _parse_cmd_line=False)
        if dataset_name not in bench_ctr._LOADER_CACHE:
            ds = bench_ctr.synth_ctr_dataset(
                cfg, bench_ctr.SHAPES[dataset_name])
            bench_ctr._LOADER_CACHE[dataset_name] = data_preparation(cfg, ds)
        train, _, _ = bench_ctr._LOADER_CACHE[dataset_name]
        m = get_model(model_name)(cfg, train.dataset)
        params = m.attach_consts(m.zero_pad_rows(
            m.init_params(jax.random.key(0))))
        B = cfg["train_batch_size"]
        batch = {"label": jnp.zeros((B,), jnp.float32)}
        for f, t in train.dataset.field2type.items():
            from recbole_tpu.utils.enums import FeatureType
            if f == "label":
                continue
            batch[f] = (jnp.zeros((B,), jnp.float32)
                        if t is FeatureType.FLOAT
                        else jnp.ones((B,), jnp.int32))

        def loss(p, b):
            return m.calculate_loss(p, b)

        txt = jax.jit(jax.grad(loss)).lower(params, batch).compile().as_text()
        out[mode] = {
            "scatter": txt.count("scatter("),
            "all_scatter_mentions": txt.count("scatter"),
            "sort": txt.count("sort("),
        }
        print(f"[hlo] {model_name} {mode}: {out[mode]}", flush=True)
    os.environ.pop("RECBOLE_TPU_DEDUP_GATHER", None)
    return out


def main():
    import bench_ctr

    models = [a for a in sys.argv[1:] if not a.startswith("--")] \
        or ["FM", "DeepFM"]
    results = {}
    for model in models:
        results[model] = {"hlo": hlo_scatter_audit(model)}
        for learner in ("adam", "sparse_adam"):
            for dedup in (True, False):
                os.environ.pop("RECBOLE_TPU_DEDUP_GATHER", None)
                if dedup:
                    os.environ["RECBOLE_TPU_DEDUP_GATHER"] = "1"
                t0 = time.time()
                tr, ev = bench_ctr.bench_model(
                    model, "criteo", epochs=3,
                    config_overrides={"learner": learner})
                cell = f"{learner}/{'dedup' if dedup else 'scatter'}"
                results[model][cell] = round(tr, 3)
                ref = bench_ctr.REFERENCE["criteo"][model][0]
                print(f"[cell] {model} {cell}: {tr:.3f} s/ep "
                      f"(ref {ref:.2f}, {ref / tr:.2f}x; wall "
                      f"{time.time() - t0:.0f}s)", flush=True)
        os.environ.pop("RECBOLE_TPU_DEDUP_GATHER", None)
    print("AB_RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
