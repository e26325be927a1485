"""Numeric parity pins for the loss primitives against the reference's
formulas (recbole/model/loss.py), computed independently with torch.

Each test builds the torch expression the reference documents (BPRLoss
loss.py:23-49, EmbLoss loss.py:70-84, RegLoss loss.py:52-67, EmbMarginLoss
loss.py:85-101) and asserts our jnp implementation matches to float32
precision.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from recbole_tpu.models.losses import (bpr_loss, emb_loss, emb_margin_loss,
                                       fro_norm, mask_rows, reg_loss)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_bpr_loss_matches_reference(rng):
    pos = rng.normal(size=64).astype(np.float32)
    neg = rng.normal(size=64).astype(np.float32)
    expected = (-torch.log(
        1e-10 + torch.sigmoid(torch.tensor(pos) - torch.tensor(neg)))
        .mean().item())
    np.testing.assert_allclose(float(bpr_loss(pos, neg)), expected, rtol=1e-6)


def test_emb_loss_per_embedding_norms(rng):
    # EmbLoss: each embedding contributes its own torch.norm(p=2); the sum is
    # divided by the LAST embedding's batch dim (loss.py:70-84)
    a = rng.normal(size=(32, 8)).astype(np.float32)
    b = rng.normal(size=(32, 8)).astype(np.float32)
    c = rng.normal(size=(32, 8)).astype(np.float32)
    expected = sum(torch.tensor(e).norm(2).item() for e in (a, b, c)) / 32
    np.testing.assert_allclose(float(emb_loss(a, b, c)), expected, rtol=1e-6)


def test_emb_loss_p1(rng):
    a = rng.normal(size=(16, 4)).astype(np.float32)
    expected = torch.tensor(a).norm(1).item() / 16
    np.testing.assert_allclose(float(emb_loss(a, norm=1)), expected,
                               rtol=1e-6)


def test_fro_norm_and_reg_loss(rng):
    w1 = rng.normal(size=(8, 8)).astype(np.float32)
    w2 = rng.normal(size=(8, 3)).astype(np.float32)
    np.testing.assert_allclose(float(fro_norm(w1)),
                               torch.tensor(w1).norm(2).item(), rtol=1e-6)
    expected = (torch.tensor(w1).norm(2) + torch.tensor(w2).norm(2)).item()
    np.testing.assert_allclose(float(reg_loss([w1, w2])), expected, rtol=1e-6)


def test_emb_margin_loss(rng):
    # EmbMarginLoss: Σ rows max(Σ e² − 1, 0) — plain sum, no batch division
    e1 = (rng.normal(size=(16, 6)) * 0.8).astype(np.float32)
    e2 = (rng.normal(size=(16, 6)) * 0.2).astype(np.float32)
    expected = 0.0
    for e in (e1, e2):
        t = torch.tensor(e)
        norm_e = torch.sum(t ** 2, dim=1, keepdim=True)
        expected += torch.sum(torch.clamp(norm_e - 1.0, min=0.0)).item()
    assert expected > 0  # ensure the clip actually bites for some rows
    np.testing.assert_allclose(float(emb_margin_loss(e1, e2)), expected,
                               rtol=1e-6)


def test_mask_rows_drops_padding_from_norm_regs(rng):
    real = rng.normal(size=(8, 4)).astype(np.float32)
    padded = np.concatenate([real, rng.normal(size=(4, 4)).astype(np.float32)])
    w = np.array([1.0] * 8 + [0.0] * 4, dtype=np.float32)
    (masked,) = mask_rows(w, padded)
    np.testing.assert_allclose(
        float(fro_norm(masked)), float(fro_norm(real)), rtol=1e-6)
    # None passes through untouched
    (same,) = mask_rows(None, padded)
    np.testing.assert_array_equal(np.asarray(same), padded)


def test_pad_row_stays_zero_through_training(synth_dataset_dir, tmp_path):
    """torch's Embedding(padding_idx=0) never updates row 0; our trainer
    pins the grads of pad_zero_params tables so [PAD] rows stay exactly 0
    through real optimizer steps (GRU4Rec declares item_embedding)."""
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer

    cfg = Config("GRU4Rec", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log"),
        "epochs": 2, "scan_epochs": False, "seed": 7,
        "MAX_ITEM_LIST_LENGTH": 10,
        "valid_full_to_uni1000": False}, _parse_cmd_line=False)
    ds = create_dataset(cfg)
    train, valid, _ = data_preparation(cfg, ds)
    model = get_model("GRU4Rec")(cfg, train.dataset)
    assert "item_embedding" in model.pad_zero_params
    trainer = get_trainer(cfg["MODEL_TYPE"], "GRU4Rec")(cfg, model)
    trainer.fit(train, valid, verbose=False, saved=False)
    table = np.asarray(trainer.params["item_embedding"])
    assert np.all(table[0] == 0.0), "PAD row drifted during training"
    assert np.any(table[1:] != 0.0), "non-PAD rows should have trained"
