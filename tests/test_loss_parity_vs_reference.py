"""Numeric loss parity against the reference implementation itself.

For each covered model: run BOTH pipelines on the same synthetic atomic
files with a deterministic TO_LS split (the splits and id remaps are
byte-identical — asserted below), copy OUR initialized params into the
reference torch model, feed the SAME batch (taken from the reference's own
train dataloader) to both ``calculate_loss``, and require the scalars to
match to float32 precision.

The reference tree (/root/reference) is imported read-only as an oracle via
tests/ref_compat.py; everything skips when it isn't present.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_compat import load_reference

pytestmark = pytest.mark.skipif(load_reference() is None,
                                reason="reference tree not available")

import jax  # noqa: E402  (after ref_compat so platforms is already cpu)
import jax.numpy as jnp  # noqa: E402


BASE_CFG = {
    "eval_setting": "TO_LS,full",
    "state": "ERROR",
    "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"]},
}


def _ref_pipeline(model, data_path, extra=None):
    from recbole.config import Config
    from recbole.data import create_dataset, data_preparation
    from recbole.utils import init_seed, get_model
    cfg = {**BASE_CFG, "data_path": data_path, **(extra or {})}
    config = Config(model=model, dataset="synth", config_dict=cfg)
    init_seed(config["seed"], config["reproducibility"])
    ds = create_dataset(config)
    train, valid, test = data_preparation(config, ds)
    m = get_model(config["model"])(config, train).to("cpu")
    m.eval()
    return config, ds, train, m


def _our_pipeline(model, data_path, extra=None):
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.utils import create_dataset, data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.utils.utils import init_seed
    cfg = {**BASE_CFG, "data_path": data_path, **(extra or {})}
    config = Config(model=model, dataset="synth", config_dict=cfg)
    init_seed(config["seed"], config["reproducibility"])
    ds = create_dataset(config)
    train, _, _ = data_preparation(config, ds)
    # mirror quick_start.py: the model sees the TRAIN-SPLIT dataset
    m = get_model(model)(config, train.dataset)
    params = m.init_params(jax.random.key(0, impl="rbg"))
    return config, ds, m, params


def _first_ref_batch(train_loader):
    inter = next(iter(train_loader))
    return {k: v.numpy() for k, v in inter.interaction.items()}, inter


def _to_jnp(batch_np):
    return {k: jnp.asarray(v) for k, v in batch_np.items()}


def _scalar(loss):
    if isinstance(loss, tuple):
        return float(sum(float(p) for p in loss))
    return float(loss)


def _load(ref_model, updates):
    sd = ref_model.state_dict()
    for k, v in updates.items():
        arr = np.asarray(v, dtype=np.float32)
        assert tuple(sd[k].shape) == arr.shape, \
            f"{k}: ref {tuple(sd[k].shape)} vs ours {arr.shape}"
        sd[k] = torch.tensor(arr)
    ref_model.load_state_dict(sd)


def _compare(model, data_path, mapper, extra=None, rtol=2e-4):
    _, rds, rtrain, ref_m = _ref_pipeline(model, data_path, extra)
    _, ods, our_m, params = _our_pipeline(model, data_path, extra)
    assert rds.user_num == ods.user_num and rds.item_num == ods.item_num
    batch_np, inter = _first_ref_batch(rtrain)
    mapper(ref_m, params)
    with torch.no_grad():
        ref_loss = _scalar(ref_m.calculate_loss(inter))
    our_loss = _scalar(our_m.calculate_loss(params, _to_jnp(batch_np),
                                            rng=None))
    np.testing.assert_allclose(our_loss, ref_loss, rtol=rtol,
                               err_msg=f"{model} loss mismatch")


def test_lightgcn_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
        })
    _compare("LightGCN", synth_dataset_dir, mapper)


def test_transrec_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            "bias.weight": np.asarray(params["item_bias"])[:, None],
            "T": params["T"],
        })
    _compare("TransRec", synth_dataset_dir, mapper)


def test_shan_loss_parity(synth_dataset_dir):
    def mapper(ref_m, params):
        D = np.asarray(params["long_w"]).shape[0]
        _load(ref_m, {
            "user_embedding.weight": params["user_embedding"],
            "item_embedding.weight": params["item_embedding"],
            # ours folds torch's Linear.bias and the extra long_b parameter
            # into ONE bias; split as (linear bias = 0, long_b = ours)
            "long_w.weight": np.asarray(params["long_w"]).T,
            "long_w.bias": np.zeros(D, np.float32),
            "long_b": params["long_b"],
            "long_short_w.weight": np.asarray(params["short_w"]).T,
            "long_short_w.bias": np.zeros(D, np.float32),
            "long_short_b": params["short_b"],
        })
    _compare("SHAN", synth_dataset_dir, mapper,
             extra={"training_neg_sample_num": 0})
