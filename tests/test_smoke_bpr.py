"""End-to-end smoke: BPR on the synthetic dataset, 2 epochs, full pipeline."""

from recbole_tpu import run_recbole


def test_bpr_end_to_end(synth_dataset_dir, tmp_path):
    result = run_recbole(
        model="BPR", dataset="synth",
        config_dict={
            "data_path": synth_dataset_dir,
            "epochs": 2,
            "train_batch_size": 512,
            "eval_batch_size": 512,
            "checkpoint_dir": str(tmp_path / "saved"),
            "log_dir": str(tmp_path / "log"),
            "state": "ERROR",
            "valid_full_to_uni1000": False,
        },
        saved=True,
    )
    assert "test_result" in result
    tr = result["test_result"]
    assert set(tr) == {"recall@10", "mrr@10", "ndcg@10", "hit@10", "precision@10"}
    assert all(0.0 <= v <= 1.0 for v in tr.values())
    # with planted structure, 2 epochs of BPR must beat the ~random floor
    assert tr["hit@10"] > 0.05
