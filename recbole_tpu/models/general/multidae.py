"""MultiDAE: denoising autoencoder with multinomial likelihood.

Parity target: reference MultiDAE (recbole/model/general_recommender/multidae.py)
— dropout-corrupted normalized multi-hot input, MLP encoder/decoder, softmax
cross-entropy reconstruction.
"""

import jax
import jax.numpy as jnp

from ..layers import mlp_init, dropout_apply
from ...utils.enums import InputType
from .. import register_model
from .multivae import MultiVAE


@register_model("MultiDAE")
class MultiDAE(MultiVAE):
    input_type = InputType.LISTWISE
    train_batch_kind = "user"
    default_config = {"mlp_hidden_size": [600], "latent_dimension": 64,
                      "dropout_prob": 0.5, "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        config["anneal_cap"] = 0.0
        config["total_anneal_steps"] = 0
        super().__init__(config, dataset)
        self.enc_dims = [self.n_items] + self.hidden + [self.latent]
        self.dec_dims = [self.latent] + self.hidden[::-1] + [self.n_items]

    def _forward(self, params, x, rng=None):
        h = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        if rng is not None and self.dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            h = dropout_apply(dk, h, self.dropout_prob)
        z = self._mlp(params["encoder"], h, final_act=True)
        logits = self._mlp(params["decoder"], z)
        return logits, None, None

    def calculate_loss(self, params, batch, rng=None):
        user = batch[self.USER_ID]
        x = self._rating_matrix(user)
        logits, _, _ = self._forward(params, x, rng)
        w = batch.get("_weight")
        w = jnp.ones(x.shape[0]) if w is None else w
        ce = -jnp.sum(
            (jax.nn.log_softmax(logits, -1) * x).sum(-1) * w) / jnp.maximum(
            jnp.sum(w), 1.0)
        return ce
