"""MultiVAE: variational autoencoder with multinomial likelihood.

Parity target: reference MultiVAE (recbole/model/general_recommender/multivae.py)
— encoder MLP -> (mu, logvar), reparameterized z, decoder MLP -> item logits;
loss = -mean sum(log_softmax(logits) * x) + anneal * KL with linear KL
annealing over total_anneal_steps. Trains on batches of bare user ids (the
reference's UserDataLoader); the user's multi-hot row is reconstructed on
device from the train history matrix captured at construction.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import mlp_init, xavier_normal, dropout_apply
from ...utils.enums import InputType
from .. import register_model


@register_model("MultiVAE")
class MultiVAE(GeneralRecommender):
    input_type = InputType.LISTWISE
    train_batch_kind = "user"
    default_config = {"mlp_hidden_size": [600], "latent_dimension": 128,
                      "dropout_prob": 0.5, "anneal_cap": 0.2,
                      "total_anneal_steps": 200000,
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.hidden = list(config["mlp_hidden_size"])
        self.latent = config["latent_dimension"]
        self.dropout_prob = config["dropout_prob"]
        self.anneal_cap = config["anneal_cap"]
        self.total_anneal_steps = config["total_anneal_steps"]
        self.init_history(dataset)
        # latent_dimension counts mu+logvar TOGETHER: z is lat // 2
        # (reference multivae.py encode dims end at latent_dimension and the
        # decoder starts at latent_dimension // 2)
        self.z_dim = self.latent // 2
        self.enc_dims = [self.n_items] + self.hidden + [self.latent]
        self.dec_dims = [self.z_dim] + self.hidden[::-1] + [self.n_items]

    def init_params(self, rng):
        ke, kd = jax.random.split(rng)
        return {"encoder": mlp_init(ke, self.enc_dims, "xavier_normal"),
                "decoder": mlp_init(kd, self.dec_dims, "xavier_normal")}


    def _mlp(self, layers, x, act=jnp.tanh, final_act=False):
        n = len(layers)
        for li, layer in enumerate(layers):
            x = jnp.dot(x, layer["w"], preferred_element_type=jnp.float32) + layer["b"]
            if final_act or li < n - 1:
                x = act(x)
        return x

    def _forward(self, params, x, rng=None):
        h = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        if rng is not None and self.dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            h = dropout_apply(dk, h, self.dropout_prob)
        enc = self._mlp(params["encoder"], h)
        mu, logvar = enc[:, :self.z_dim], enc[:, self.z_dim:]
        if rng is not None:
            rng, zk = jax.random.split(rng)
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(zk, mu.shape)
        else:
            z = mu
        logits = self._mlp(params["decoder"], z)
        return logits, mu, logvar

    def calculate_loss(self, params, batch, rng=None):
        user = batch[self.USER_ID]
        x = self._rating_matrix(user)
        logits, mu, logvar = self._forward(params, x, rng)
        step = batch.get("_step", jnp.int32(0)).astype(jnp.float32)
        # anneal = min(cap, step/total) — plain ratio clipped at the cap
        # (reference multivae.py:107-111)
        anneal = jnp.minimum(step / self.total_anneal_steps,
                             self.anneal_cap) if self.total_anneal_steps > 0 \
            else jnp.float32(self.anneal_cap)
        w = batch.get("_weight")
        w = jnp.ones(x.shape[0]) if w is None else w
        kl = -0.5 * jnp.sum(
            (1 + logvar - mu ** 2 - jnp.exp(logvar)).sum(-1) * w) / jnp.maximum(
            jnp.sum(w), 1.0)
        ce = -jnp.sum(
            (jax.nn.log_softmax(logits, -1) * x).sum(-1) * w) / jnp.maximum(
            jnp.sum(w), 1.0)
        return ce + anneal * kl

    def predict(self, params, batch):
        logits, _, _ = self._forward(
            params, self._rating_matrix(batch[self.USER_ID]))
        return jnp.take_along_axis(logits, batch[self.ITEM_ID][:, None], 1)[:, 0]

    def full_sort_predict(self, params, batch):
        logits, _, _ = self._forward(
            params, self._rating_matrix(batch[self.USER_ID]))
        return logits
