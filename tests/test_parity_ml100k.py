"""Quality parity on the real ml-100k dataset (reference README quick-start).

Gated on the reference's bundled dataset being mounted; a short 30-epoch run
must land in a sane band of the reference's published full-training numbers
(README.md:152-156). Full-length parity evidence lives in PARITY.md.
"""

import os

import pytest

from recbole_tpu import objective_function

ML100K_ROOT = "/root/reference/recbole/dataset_example"


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(ML100K_ROOT, "ml-100k", "ml-100k.inter")),
    reason="reference ml-100k not mounted")
def test_bpr_ml100k_quality(tmp_path):
    result = objective_function(
        config_dict={"model": "BPR", "dataset": "ml-100k",
                     "data_path": ML100K_ROOT,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     "epochs": 30, "state": "ERROR",
                     "valid_full_to_uni1000": False},
        saved=False)
    tr = result["test_result"]
    # 30 epochs reaches most of the quality; full training (PARITY.md)
    # matches the reference within noise (ref test recall@10 = 0.2368)
    assert tr["recall@10"] > 0.15, tr
    assert tr["mrr@10"] > 0.30, tr
    assert tr["hit@10"] > 0.60, tr
