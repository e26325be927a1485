"""KG dataset semantics + knowledge model smoke."""

import numpy as np
import pytest

from recbole_tpu import objective_function
from recbole_tpu.config.configurator import Config
from recbole_tpu.data.kg_dataset import KnowledgeBasedDataset


def test_entity_remap_sections(synth_dataset_dir):
    cfg = Config("CKE", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
    }, _parse_cmd_line=False)
    ds = KnowledgeBasedDataset(cfg)
    # linked entities share item ids: entity e1 <-> item i1
    i1 = ds.token2id("item_id", "i1")
    assert ds.field2token_id["entity_id"]["e1"] == i1
    # kg-only entities extend beyond n_items
    assert ds.entity_num > ds.item_num
    h, r, t = ds.kg_arrays()
    assert h.max() < ds.entity_num and t.max() < ds.entity_num
    assert r.max() < ds.relation_num - 1  # [UI-Relation] never appears in .kg
    assert ds.field2id_token["relation_id"][-1] == "[UI-Relation]"
    # ckg contains both directions of the interactions
    ch, cr, ct = ds.ckg_arrays()
    assert len(ch) == len(h) + 2 * ds.inter_num


@pytest.mark.parametrize("model", ["CKE", "CFKG", "KTUP", "MKR", "KGAT", "KGCN", "KGNNLS", "RippleNet"])
def test_kg_model_smoke(model, synth_dataset_dir, tmp_path):
    result = objective_function(
        config_dict={"model": model, "dataset": "synth",
                     "data_path": synth_dataset_dir,
                     "checkpoint_dir": str(tmp_path / "saved"),
                     "log_dir": str(tmp_path / "log"),
                     "epochs": 1, "train_batch_size": 256,
                     "state": "ERROR", "scan_epochs": False,
                     "valid_full_to_uni1000": False},
        saved=False)
    tr = result["test_result"]
    assert tr and all(0.0 <= v <= 1.0 for v in tr.values())
