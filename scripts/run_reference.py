"""Run the READ-ONLY reference implementation (/root/reference, CPU torch)
for head-to-head quality comparisons against recbole_tpu (PARITY.md).

Usage: python scripts/run_reference.py --model=BPR --dataset=ml-100k \
           --data_path=/root/reference/recbole/dataset_example --epochs=10

Imports the reference through tests/ref_compat's shims (colorlog/gensim
stubs, pandas-2 remap/fillna fixes, numpy aliases); nothing is copied from
the reference tree.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.ref_compat import load_reference

if load_reference() is None:
    raise SystemExit("reference tree not available")


def _coerce(v):
    try:
        return eval(v, {}, {})  # noqa: S307 — mirror the reference's coercion
    except Exception:  # noqa: BLE001
        return v


def main():
    cfg = {}
    model, dataset = "BPR", "ml-100k"
    for arg in sys.argv[1:]:
        if not arg.startswith("--") or "=" not in arg:
            continue
        k, v = arg[2:].split("=", 1)
        if k == "model":
            model = v
        elif k == "dataset":
            dataset = v
        else:
            cfg[k] = _coerce(v)
    cfg.setdefault("data_path", "/root/reference/recbole/dataset_example")
    from recbole.quick_start import run_recbole
    run_recbole(model=model, dataset=dataset, config_dict=cfg, saved=False)


if __name__ == "__main__":
    main()
