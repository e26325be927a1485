"""Criteo scatter-story A/B (round-4 VERDICT task 4).

Six cells — {adam, sparse_adam} x {grouped (r4 default), plain scatter,
dedup sort+segment-sum} — at the reference's exact Criteo shape, DeepFM and
FM, each 1 warm + 3 timed epochs, plus an HLO audit of each gradient mode's
compiled loss-grad module (scatter/sort op counts), so backward-strategy
claims are checked, not asserted.

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
    for mode in ("grouped", "dedup", "scatter"):
        _set_grad_mode(mode)
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
    _set_grad_mode("grouped")
    return out


def _set_grad_mode(mode):
    """grouped = the r4 TPU default (field-grouped backward); scatter =
    plain XLA scatter-add; dedup = sort + sorted segment-sum. Envs are read
    at trace time by context_base._lookup."""
    os.environ.pop("RECBOLE_TPU_DEDUP_GATHER", None)
    os.environ.pop("RECBOLE_TPU_CTR_SCATTER", None)
    if mode == "dedup":
        os.environ["RECBOLE_TPU_DEDUP_GATHER"] = "1"
    elif mode == "scatter":
        os.environ["RECBOLE_TPU_CTR_SCATTER"] = "1"


def main():
    import bench_ctr

    models = [a for a in sys.argv[1:] if not a.startswith("--")] \
        or ["FM", "DeepFM"]
    results = {}
    for model in models:
        results[model] = {"hlo": hlo_scatter_audit(model)}
        for learner in ("adam", "sparse_adam"):
            for mode in ("grouped", "scatter", "dedup"):
                _set_grad_mode(mode)
                t0 = time.time()
                tr, ev = bench_ctr.bench_model(
                    model, "criteo", epochs=3,
                    config_overrides={"learner": learner})
                cell = f"{learner}/{mode}"
                results[model][cell] = round(tr, 3)
                ref = bench_ctr.REFERENCE["criteo"][model][0]
                print(f"[cell] {model} {cell}: {tr:.3f} s/ep "
                      f"(ref {ref:.2f}, {ref / tr:.2f}x; wall "
                      f"{time.time() - t0:.0f}s)", flush=True)
        _set_grad_mode("grouped")
    print("AB_RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
