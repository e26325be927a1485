"""BPR on ml-100k — metric parity check against the reference README numbers
(README.md:152-156: test recall@10 0.2368, mrr@10 0.4519, ndcg@10 0.2768).

Reads the ml-100k atomic files from the read-only reference checkout.
Run: python scripts/parity_bpr_ml100k.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recbole_tpu import run_recbole

ML100K_PATH = os.environ.get(
    "RECBOLE_TPU_ML100K", "/root/reference/recbole/dataset_example")

if __name__ == "__main__":
    t0 = time.time()
    result = run_recbole(
        model="BPR", dataset="ml-100k",
        config_dict={
            "data_path": ML100K_PATH,
            "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
            "valid_full_to_uni1000": False,
            "epochs": int(os.environ.get("EPOCHS", 300)),
        },
        saved=True,
    )
    out = {
        "wall_s": round(time.time() - t0, 1),
        "best_valid": result["best_valid_result"],
        "test": result["test_result"],
        "reference_test": {"recall@10": 0.2368, "mrr@10": 0.4519, "ndcg@10": 0.2768},
    }
    print(json.dumps(out))
