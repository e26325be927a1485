"""NeuMF: neural matrix factorization (upstream model).

Parity target: reference NeuMF (recbole/model/general_recommender/neumf.py) —
GMF and MLP towers with independent embeddings, mf_train/mlp_train switches,
sigmoid + BCE pointwise. Pretrain-loading is a checkpoint concern handled by
the trainer, not the model.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import (normal_init, mlp_init, dropout_apply,
                      torch_linear_uniform, torch_linear_bias)
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("NeuMF")
class NeuMF(GeneralRecommender):
    input_type = InputType.POINTWISE
    default_config = {"mf_embedding_size": 64, "mlp_embedding_size": 64,
                      "mlp_hidden_size": [128, 64, 32], "dropout_prob": 0.0,
                      "weight_decay": 1e-8, "mf_train": True, "mlp_train": True,
                      "valid_metric": "Hit@10", "use_pretrain": False}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.mf_dim = config["mf_embedding_size"]
        self.mlp_dim = config["mlp_embedding_size"]
        self.mlp_hidden = list(config["mlp_hidden_size"])
        self.dropout_prob = config["dropout_prob"]
        self.mf_train = config["mf_train"]
        self.mlp_train = config["mlp_train"]
        if not (self.mf_train or self.mlp_train):
            raise ValueError("at least one of mf_train/mlp_train must be True")
        out_in = (self.mf_dim if self.mf_train else 0) + \
                 (self.mlp_hidden[-1] if self.mlp_train else 0)
        self.out_in = out_in
        # per-(user,item)-pair transient estimate for the trainer's
        # auto-sized chunked eval fallback (512MB budget rule)
        self.eval_pair_bytes = 8 * (2 * self.mlp_dim + sum(self.mlp_hidden)
                                    + (self.mf_dim if self.mf_train else 0))

    def init_params(self, rng):
        # embeddings normal(0, 0.01); Linear layers keep torch DEFAULT init
        # (the reference's _init_weights, neumf.py:101-103, only re-inits
        # Embeddings — kaiming-uniform Linears + uniform biases remain)
        ks = jax.random.split(rng, 7)
        return {
            "mf_user_embedding": normal_init(ks[0], (self.n_users, self.mf_dim)),
            "mf_item_embedding": normal_init(ks[1], (self.n_items, self.mf_dim)),
            "mlp_user_embedding": normal_init(ks[2], (self.n_users, self.mlp_dim)),
            "mlp_item_embedding": normal_init(ks[3], (self.n_items, self.mlp_dim)),
            "mlp": mlp_init(ks[4], [self.mlp_dim * 2] + self.mlp_hidden,
                            "torch_linear"),
            "out_w": torch_linear_uniform(ks[5], (self.out_in, 1)),
            "out_b": torch_linear_bias(ks[6], self.out_in, 1),
        }

    def _logits(self, params, user, item, rng=None):
        parts = []
        if self.mf_train:
            parts.append(params["mf_user_embedding"][user]
                         * params["mf_item_embedding"][item])
        if self.mlp_train:
            x = jnp.concatenate([params["mlp_user_embedding"][user],
                                 params["mlp_item_embedding"][item]], -1)
            for layer in params["mlp"]:
                if rng is not None and self.dropout_prob > 0:
                    rng, dk = jax.random.split(rng)
                    x = dropout_apply(dk, x, self.dropout_prob)
                x = jax.nn.relu(
                    jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
                    + layer["b"])
            parts.append(x)
        joint = jnp.concatenate(parts, -1)
        return jnp.dot(joint, params["out_w"],
                       preferred_element_type=jnp.float32)[:, 0] + params["out_b"][0]

    def calculate_loss(self, params, batch, rng=None):
        logits = self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID], rng)
        return bce_loss(logits, batch[self.LABEL], batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID]))
