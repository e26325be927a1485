"""Multi-seed quality head-to-head: recbole_tpu vs the READ-ONLY reference
fork, same model / dataset / protocol / seeds, both pipelines run on THIS
machine (reference = CPU torch via tests/ref_compat shims; ours = whatever
backend JAX picks).

Presets mirror the reference's quick-start protocols
(recbole/properties/quick_start_config/*.yaml):

  ctr   context-aware_ml-100k + context-aware.yaml: threshold rating>=4,
        user/item features loaded, RO_RS ungrouped, no neg sampling,
        AUC/LogLoss value metrics (valid on AUC)
  seq   sequential.yaml: TO_LS, full-sort ranking metrics
  gen   general default: RO_RS grouped, full-sort ranking metrics

Usage:
  python scripts/parity_head2head.py --model=FM --preset=ctr \
      [--seeds=2020,2021,2022] [--epochs=50] [--side=both|ref|tpu]

Prints one JSON line per (side, seed) run and a final summary line.
"""

import ast
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ML100K_PATH = os.environ.get(
    "RECBOLE_TPU_ML100K", "/root/reference/recbole/dataset_example")

PRESETS = {
    "ctr": {
        "threshold": {"rating": 4},
        "load_col": {
            "inter": ["user_id", "item_id", "rating", "timestamp"],
            "user": ["user_id", "age", "gender", "occupation"],
            "item": ["item_id", "release_year", "class"],
        },
        "eval_setting": "RO_RS",
        "group_by_user": False,
        "training_neg_sample_num": 0,
        "metrics": ["AUC", "LogLoss"],
        "valid_metric": "AUC",
    },
    "seq": {
        "eval_setting": "TO_LS,full",
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
        # SASRec-family default loss is CE; the reference requires no
        # negative sampling with CE (configurator.py:280)
        "training_neg_sample_num": 0,
    },
    "gen": {
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
    },
}


def run_tpu(model, cfg, seed):
    from recbole_tpu import run_recbole
    r = run_recbole(model=model, dataset="ml-100k",
                    config_dict={"valid_full_to_uni1000": False, **cfg,
                                 "seed": seed,
                                 "data_path": ML100K_PATH},
                    saved=False)
    return {"best_valid": dict(r["best_valid_result"]),
            "test": dict(r["test_result"])}


def run_ref(model, cfg, seed):
    from tests.ref_compat import load_reference
    if load_reference() is None:
        raise SystemExit("reference tree not available")
    from recbole.quick_start import run_recbole
    r = run_recbole(model=model, dataset="ml-100k",
                    config_dict={**cfg, "seed": seed,
                                 "data_path": ML100K_PATH},
                    saved=False)
    return {"best_valid": dict(r["best_valid_result"]),
            "test": dict(r["test_result"])}


def main():
    model, preset, side = "FM", "ctr", "both"
    seeds, epochs = [2020, 2021, 2022], 50
    extra = {}
    for arg in sys.argv[1:]:
        if not arg.startswith("--") or "=" not in arg:
            continue
        k, v = arg[2:].split("=", 1)
        if k == "model":
            model = v
        elif k == "preset":
            preset = v
        elif k == "side":
            side = v
        elif k == "seeds":
            seeds = [int(s) for s in v.split(",")]
        elif k == "epochs":
            epochs = int(v)
        elif k == "_worker":
            # internal: run ONE (side, seed) in this process and print JSON.
            # Each run gets a fresh process: the reference pollutes global
            # torch/logging state, and JAX vs torch-OMP thread pools fight.
            w = json.loads(v)
            plat = os.environ.get("RECBOLE_H2H_PLATFORM")
            if plat and w["side"] == "tpu":
                import jax
                jax.config.update("jax_platforms", plat)
            fn = run_ref if w["side"] == "ref" else run_tpu
            print("H2H_RESULT " + json.dumps(
                fn(w["model"], w["cfg"], w["seed"])))
            return
        else:
            try:
                extra[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                extra[k] = v

    cfg = {**PRESETS[preset], "epochs": epochs, **extra}
    sides = ["ref", "tpu"] if side == "both" else [side]
    results = {s: {} for s in sides}
    for s in sides:
        for seed in seeds:
            spec = json.dumps(
                {"side": s, "model": model, "cfg": cfg, "seed": seed})
            env = dict(os.environ)
            if s == "ref":
                env["CUDA_VISIBLE_DEVICES"] = ""
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 f"--_worker={spec}"],
                capture_output=True, text=True, env=env, cwd=REPO)
            line = [l for l in p.stdout.splitlines()
                    if l.startswith("H2H_RESULT ")]
            if not line:
                print(f"{s} seed={seed} FAILED:\n{p.stdout[-2000:]}"
                      f"\n{p.stderr[-2000:]}", file=sys.stderr)
                continue
            results[s][seed] = json.loads(line[-1][len("H2H_RESULT "):])
            print(json.dumps({"side": s, "seed": seed,
                              **results[s][seed]}), flush=True)

    summary = {"model": model, "preset": preset, "epochs": epochs,
               "seeds": seeds}
    for s in sides:
        tests = [results[s][x]["test"] for x in seeds if x in results[s]]
        if not tests:
            continue
        keys = tests[0].keys()
        summary[s] = {
            k: {"per_seed": [round(t[k], 4) for t in tests],
                "mean": round(sum(t[k] for t in tests) / len(tests), 4)}
            for k in keys}
    print("H2H_SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
