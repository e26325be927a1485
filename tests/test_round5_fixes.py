"""Round-5 regressions: fused CTR gather parity + trm_layer kernel parity.

1. ContextRecommender.embed_and_first_order (one (V, D+1) gather carrying
   the first-order bias as the last column) must match the separate
   embed_input + first_order pair in values AND gradients.
2. ops/trm_layer.fused_transformer_layer2 (interpret mode) must match the
   XLA bf16 transformer path in forward and gradients.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _fm_setup(synth_dataset_dir, tmp_path):
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.dataset import Dataset
    from recbole_tpu.data.utils import data_preparation
    from recbole_tpu.models import get_model

    config = Config("FM", "synth", config_dict={
        "data_path": synth_dataset_dir, "state": "ERROR",
        "threshold": {"rating": 4}, "normalize_all": True,
        "checkpoint_dir": str(tmp_path / "saved"),
        "log_dir": str(tmp_path / "log"),
        "load_col": {"inter": ["user_id", "item_id", "rating", "timestamp"],
                     "user": ["user_id", "age", "gender"],
                     "item": ["item_id", "genre", "price"]},
    }, _parse_cmd_line=False)
    ds = Dataset(config)
    train_data, _, _ = data_preparation(config, ds)
    model = get_model("FM")(config, train_data.dataset)
    params = model.init_params(jax.random.key(0, impl="rbg"))
    cols = train_data.dataset.inter_feat
    n = 64
    batch = {k: jnp.asarray(v[:n]) for k, v in cols.items()
             if isinstance(v, np.ndarray) and v.ndim == 1}
    return model, params, batch


def test_fused_ctr_gather_matches_separate(synth_dataset_dir, tmp_path):
    model, params, batch = _fm_setup(synth_dataset_dir, tmp_path)

    def fused(p):
        os.environ["RECBOLE_TPU_CTR_FORCE_FUSED"] = "1"
        try:
            emb, linear = model.embed_and_first_order(p, batch)
        finally:
            os.environ.pop("RECBOLE_TPU_CTR_FORCE_FUSED", None)
        return emb, linear

    def separate(p):
        return model.embed_input(p, batch), model.first_order(p, batch)

    emb_f, lin_f = fused(params)
    emb_s, lin_s = separate(params)
    np.testing.assert_allclose(np.asarray(emb_f), np.asarray(emb_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lin_f), np.asarray(lin_s),
                               rtol=1e-6, atol=1e-6)

    def loss_fused(p):
        emb, linear = fused(p)
        return jnp.sum(jnp.tanh(linear + jnp.sum(emb, axis=(1, 2))))

    def loss_sep(p):
        emb, linear = separate(p)
        return jnp.sum(jnp.tanh(linear + jnp.sum(emb, axis=(1, 2))))

    gf = jax.grad(loss_fused)(params)
    gs = jax.grad(loss_sep)(params)
    for k in gs:
        np.testing.assert_allclose(
            np.asarray(gf[k]), np.asarray(gs[k]), rtol=1e-5, atol=1e-5,
            err_msg=f"grad mismatch on {k}")


@pytest.mark.parametrize("causal", [True, False])
def test_trm_layer2_matches_xla(causal):
    from recbole_tpu.models.layers import transformer_init, transformer_apply
    from recbole_tpu.ops.trm_layer import fused_transformer_layer2

    B, L, D, H, I = 8, 8, 16, 2, 32
    rng = jax.random.key(0, impl="rbg")
    k1, k2, k3 = jax.random.split(rng, 3)
    params = transformer_init(k1, 1, H, D, I)
    x = jax.random.normal(k2, (B, L, D), jnp.float32) * 0.5
    lens = jax.random.randint(k3, (B,), 1, L + 1, jnp.int32)
    key_valid = (jnp.arange(L)[None, :] < lens[:, None]).astype(jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)

    def xla_fwd(p, x):
        return transformer_apply(p, x, None, H, act="gelu",
                                 compute_dtype=jnp.bfloat16,
                                 mask_spec=(key_valid, causal))

    def ker_fwd(p, x):
        return fused_transformer_layer2(x, p[0], key_valid, seed, n_heads=H,
                                        causal=causal, interpret=True)

    y_ref = xla_fwd(params, x)
    y_ker = ker_fwd(params, x)
    scale = float(jnp.max(jnp.abs(y_ref)))
    assert float(jnp.max(jnp.abs(y_ref - y_ker))) < 2e-2 * scale

    gx = jax.grad(lambda p, x: jnp.sum(jnp.tanh(xla_fwd(p, x))),
                  argnums=(0, 1))(params, x)
    gk = jax.grad(lambda p, x: jnp.sum(jnp.tanh(ker_fwd(p, x))),
                  argnums=(0, 1))(params, x)
    fx, _ = jax.tree_util.tree_flatten(gx)
    fk, _ = jax.tree_util.tree_flatten(gk)
    gscale = max(float(jnp.max(jnp.abs(a))) for a in fx)
    for a, b in zip(fx, fk):
        # floor the denominator: leaves whose true grad is ~0 (e.g. bk)
        # make pure relative error meaningless
        denom = max(float(jnp.max(jnp.abs(a))), 1e-2 * gscale)
        assert float(jnp.max(jnp.abs(a - b))) / denom < 3e-2


def test_fused_adam_matches_optax(synth_dataset_dir, tmp_path):
    """The inlined single-pass adam (trainer._fused_adam_apply) must produce
    the same trajectory as the optax chain it replaces."""
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.data.dataset import Dataset
    from recbole_tpu.data.utils import data_preparation
    from recbole_tpu.models import get_model
    from recbole_tpu.trainer.trainer import get_trainer
    from recbole_tpu.utils.utils import init_seed

    results = {}
    for mode in ("fused", "optax"):
        if mode == "optax":
            os.environ["RECBOLE_TPU_NO_FUSED_ADAM"] = "1"
        try:
            config = Config("BPR", "synth", config_dict={
                "data_path": synth_dataset_dir, "state": "ERROR",
                "epochs": 2, "train_batch_size": 256, "scan_epochs": False,
                "checkpoint_dir": str(tmp_path / f"saved_{mode}"),
                "log_dir": str(tmp_path / f"log_{mode}"),
            }, _parse_cmd_line=False)
            init_seed(config["seed"])
            ds = Dataset(config)
            train_data, _, _ = data_preparation(config, ds)
            trainer = get_trainer(config["MODEL_TYPE"], "BPR")(config,
                get_model("BPR")(config, train_data.dataset))
            trainer.prepare(train_data)
            assert trainer._fused_adam == (mode == "fused")
            for ep in range(2):
                trainer._train_epoch(train_data, ep)
            results[mode] = jax.tree.map(np.asarray, trainer.params)
        finally:
            os.environ.pop("RECBOLE_TPU_NO_FUSED_ADAM", None)

    flat_f, _ = jax.tree_util.tree_flatten(results["fused"])
    flat_o, _ = jax.tree_util.tree_flatten(results["optax"])
    for a, b in zip(flat_f, flat_o):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="rel_apply kernel is TPU-only")
def test_rel_apply_matches_xla_loop():
    """ops/rel_apply vs the relation-vocabulary XLA loop (values + grads)."""
    N, D, NR = 2048, 64, 13
    k = jax.random.split(jax.random.key(0, impl="rbg"), 3)
    v = jax.random.normal(k[0], (N, D))
    rel = jax.random.randint(k[1], (N,), 0, NR, jnp.int32)
    R = jax.random.normal(k[2], (NR, D, D)) * 0.1
    from recbole_tpu.ops.rel_apply import rel_apply

    def xla_loop(v, rel, R):
        out = jnp.zeros_like(v)
        for r in range(NR):
            mask = (rel == r).astype(v.dtype)[:, None]
            out = out + jnp.einsum("nj,ij->ni", v * mask, R[r],
                                   preferred_element_type=jnp.float32)
        return out

    y_ref = jax.jit(xla_loop)(v, rel, R)
    y_ker = jax.jit(rel_apply)(v, rel, R)
    scale = float(jnp.max(jnp.abs(y_ref)))
    assert float(jnp.max(jnp.abs(y_ref - y_ker))) < 2e-2 * scale

    gx = jax.grad(lambda v, R: jnp.sum(jnp.tanh(xla_loop(v, rel, R))),
                  argnums=(0, 1))(v, R)
    gk = jax.grad(lambda v, R: jnp.sum(jnp.tanh(rel_apply(v, rel, R))),
                  argnums=(0, 1))(v, R)
    for a, b in zip(gx, gk):
        s = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) < 2e-2 * s
