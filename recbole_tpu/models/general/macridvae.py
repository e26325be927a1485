"""MacridVAE: macro-micro disentangled VAE.

Parity target: reference MacridVAE
(recbole/model/general_recommender/macridvae.py) — K prototype (concept)
embeddings; item-to-concept assignment by gumbel-softmax over normalized
item/prototype similarity; per-concept VAE encoding of the concept-masked
rating row; decoder mixes per-concept softmax-kernel probabilities. The
reference's Python loop over K factors becomes one batched vmap over the
concept axis.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import mlp_init, xavier_normal, dropout_apply
from ..losses import fro_norm
from ...utils.enums import InputType
from .. import register_model


@register_model("MacridVAE")
class MacridVAE(GeneralRecommender):
    input_type = InputType.LISTWISE
    train_batch_kind = "user"
    default_config = {"embedding_size": 64, "drop_out": 0.5, "kfac": 10,
                      "nogb": False, "std": 0.01,
                      "encoder_hidden_size": [600], "tau": 0.1,
                      "anneal_cap": 0.2, "total_anneal_steps": 200000,
                      "reg_weights": [0.0, 0.0],
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.layers = list(config["encoder_hidden_size"])
        self.drop_out = config["drop_out"]
        self.kfac = config["kfac"]
        self.tau = config["tau"]
        self.nogb = config["nogb"]
        self.std = config["std"]
        self.anneal_cap = config["anneal_cap"]
        self.total_anneal_steps = config["total_anneal_steps"]
        self.regs = list(config["reg_weights"])
        self.init_history(dataset)
        self.enc_dims = [self.n_items] + self.layers \
            + [self.embedding_size * 2]

    def init_params(self, rng):
        ke, ki, kk = jax.random.split(rng, 3)
        return {
            "encoder": mlp_init(ke, self.enc_dims, "xavier_normal"),
            "item_embedding": xavier_normal(
                ki, (self.n_items, self.embedding_size)),
            "k_embedding": xavier_normal(
                kk, (self.kfac, self.embedding_size)),
        }


    def _encode(self, params, xk):
        h = xk
        n = len(params["encoder"])
        for li, layer in enumerate(params["encoder"]):
            h = jnp.dot(h, layer["w"],
                        preferred_element_type=jnp.float32) + layer["b"]
            if li < n - 1:
                h = jnp.tanh(h)
        return h

    def _forward(self, params, x, rng=None):
        D = self.embedding_size
        cores = params["k_embedding"]
        cores = cores / jnp.maximum(
            jnp.linalg.norm(cores, axis=1, keepdims=True), 1e-12)
        items = params["item_embedding"]
        items = items / jnp.maximum(
            jnp.linalg.norm(items, axis=1, keepdims=True), 1e-12)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        if rng is not None and self.drop_out > 0:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, self.drop_out)

        cates_logits = jnp.dot(items, cores.T) / self.tau       # (N, K)
        if self.nogb or rng is None:
            cates = jax.nn.softmax(cates_logits, axis=-1)
        else:
            rng, gk = jax.random.split(rng)
            g = -jnp.log(-jnp.log(
                jax.random.uniform(gk, cates_logits.shape) + 1e-10) + 1e-10)
            cates = jax.nn.softmax(cates_logits + g, axis=-1)

        def per_factor(cates_k, k_rng):
            x_k = x * cates_k[None, :]                          # (B, N)
            h = self._encode(params, x_k)
            mu, logvar = h[:, :D], h[:, D:]
            mu = mu / jnp.maximum(
                jnp.linalg.norm(mu, axis=1, keepdims=True), 1e-12)
            if rng is not None:
                z = mu + self.std * jnp.exp(0.5 * logvar) \
                    * jax.random.normal(k_rng, mu.shape)
            else:
                z = mu
            z = z / jnp.maximum(
                jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)
            probs_k = jnp.exp(jnp.dot(z, items.T,
                                      preferred_element_type=jnp.float32)
                              / self.tau) * cates_k[None, :]
            return probs_k, mu, logvar

        k_rngs = (jax.random.split(jax.random.fold_in(rng, 7), self.kfac)
                  if rng is not None
                  else jnp.zeros((self.kfac, 2), jnp.uint32))
        probs, mus, logvars = jax.vmap(per_factor)(cates.T, k_rngs)
        logits = jnp.log(jnp.sum(probs, axis=0) + 1e-12)        # (B, N)
        return logits, mus, logvars

    def calculate_loss(self, params, batch, rng=None):
        user = batch[self.USER_ID]
        x = self._rating_matrix(user)
        w = batch.get("_weight")
        w = jnp.ones(x.shape[0]) if w is None else w
        step = batch.get("_step", jnp.int32(0)).astype(jnp.float32)
        anneal = (jnp.minimum(self.anneal_cap,
                              step / self.total_anneal_steps)
                  if self.total_anneal_steps > 0
                  else jnp.float32(self.anneal_cap))
        logits, mus, logvars = self._forward(params, x, rng)
        wn = jnp.maximum(jnp.sum(w), 1.0)
        kl = -0.5 * jnp.sum(
            jnp.sum(1 + logvars - jnp.exp(logvars), axis=-1) * w[None, :]
        ) / wn
        ce = -jnp.sum(jnp.sum(jax.nn.log_softmax(logits, -1) * x, -1) * w) / wn
        loss = ce + anneal * kl
        if self.regs[0] or self.regs[1]:
            # parity: reference macridvae.py:173-188 — reg_1 on the item and
            # prototype tables' Frobenius norms, reg_2 on the encoder weights
            loss = (loss
                    + self.regs[0] * (fro_norm(params["item_embedding"])
                                      + fro_norm(params["k_embedding"]))
                    + self.regs[1] * sum(fro_norm(l["w"])
                                         for l in params["encoder"]))
        return loss

    def full_sort_predict(self, params, batch):
        logits, _, _ = self._forward(
            params, self._rating_matrix(batch[self.USER_ID]))
        return logits

    def predict(self, params, batch):
        logits, _, _ = self._forward(
            params, self._rating_matrix(batch[self.USER_ID]))
        return jnp.take_along_axis(logits, batch[self.ITEM_ID][:, None], 1)[:, 0]
