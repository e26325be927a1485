"""RecVAE: VAE with composite prior and alternating enc/dec training.

Parity target: reference RecVAE (recbole/model/general_recommender/recvae.py)
— 5-block dense-residual swish encoder with LayerNorm, linear decoder,
composite prior = mixture(standard normal, OLD-encoder posterior, wide
normal), gamma * |history| KL weighting; trained by the alternating
encoder/decoder loop policy (RecVAETrainer, trainer.py:938-1061) with
`update_prior` copying the live encoder into the frozen old encoder.
"""

import math

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import xavier_normal, dropout_apply, layer_norm
from ...utils.enums import InputType
from .. import register_model


def _log_norm_pdf(x, mu, logvar):
    return -0.5 * (logvar + math.log(2 * math.pi)
                   + jnp.square(x - mu) / jnp.exp(logvar))


@register_model("RecVAE")
class RecVAE(GeneralRecommender):
    input_type = InputType.LISTWISE
    train_batch_kind = "user"
    default_config = {"hidden_dimension": 600, "latent_dimension": 200,
                      "dropout_prob": 0.5, "beta": 0.2,
                      "mixture_weights": [0.15, 0.75, 0.1], "gamma": 0.005,
                      "n_enc_epochs": 3, "n_dec_epochs": 1,
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.hidden_dim = config["hidden_dimension"]
        self.latent_dim = config["latent_dimension"]
        self.dropout_prob = config["dropout_prob"]
        self.beta = config["beta"]
        self.gamma = config["gamma"]
        self.mixture_weights = list(config["mixture_weights"])
        self.init_history(dataset)

    def _encoder_init(self, rng):
        H, Z, N = self.hidden_dim, self.latent_dim, self.n_items
        ks = jax.random.split(rng, 7)
        enc = {"fc1": {"w": xavier_normal(ks[0], (N, H)), "b": jnp.zeros(H)}}
        for i in range(2, 6):
            enc[f"fc{i}"] = {"w": xavier_normal(ks[i - 1], (H, H)),
                             "b": jnp.zeros(H)}
        for i in range(1, 6):
            enc[f"ln{i}_g"] = jnp.ones(H)
            enc[f"ln{i}_b"] = jnp.zeros(H)
        enc["fc_mu"] = {"w": xavier_normal(ks[5], (H, Z)), "b": jnp.zeros(Z)}
        enc["fc_logvar"] = {"w": xavier_normal(ks[6], (H, Z)),
                            "b": jnp.zeros(Z)}
        return enc

    def init_params(self, rng):
        ke, kd = jax.random.split(rng)
        enc = self._encoder_init(ke)
        return {
            "encoder": enc,
            "encoder_old": jax.tree.map(jnp.copy, enc),
            "decoder": {"w": xavier_normal(kd, (self.latent_dim, self.n_items)),
                        "b": jnp.zeros(self.n_items)},
        }


    def _encode(self, enc, x, dropout, rng):
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        if dropout > 0 and rng is not None:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, dropout)

        # dense-residual tower: block i sees fc_i(h_{i-1}) + h_1 + ... + h_{i-1}
        # (parity: Encoder.forward, recvae.py:25-60)
        h1 = layer_norm(jax.nn.swish(
            jnp.dot(x, enc["fc1"]["w"],
                    preferred_element_type=jnp.float32) + enc["fc1"]["b"]),
            enc["ln1_g"], enc["ln1_b"], eps=1e-1)
        hs = [h1]
        for i in range(2, 6):
            fc = enc[f"fc{i}"]
            pre = jnp.dot(hs[-1], fc["w"],
                          preferred_element_type=jnp.float32) + fc["b"] \
                + sum(hs)
            hs.append(layer_norm(jax.nn.swish(pre),
                                 enc[f"ln{i}_g"], enc[f"ln{i}_b"], eps=1e-1))
        top = hs[-1]
        mu = jnp.dot(top, enc["fc_mu"]["w"]) + enc["fc_mu"]["b"]
        logvar = jnp.dot(top, enc["fc_logvar"]["w"]) + enc["fc_logvar"]["b"]
        return mu, logvar

    def _prior_logp(self, params, x, z):
        post_mu, post_logvar = self._encode(params["encoder_old"], x, 0.0, None)
        parts = [
            _log_norm_pdf(z, 0.0, jnp.zeros_like(z)),
            _log_norm_pdf(z, post_mu, post_logvar),
            _log_norm_pdf(z, 0.0, 10.0 * jnp.ones_like(z)),
        ]
        stacked = jnp.stack([p + math.log(wt) for p, wt
                             in zip(parts, self.mixture_weights)], axis=-1)
        return jax.scipy.special.logsumexp(stacked, axis=-1)

    def _loss(self, params, batch, rng, dropout):
        user = batch[self.USER_ID]
        x = self._rating_matrix(user)
        w = batch.get("_weight")
        w = jnp.ones(x.shape[0]) if w is None else w
        mu, logvar = self._encode(params["encoder"], x, dropout, rng)
        if rng is not None:
            rng, zk = jax.random.split(rng)
            z = mu + 0.01 * jnp.exp(0.5 * logvar) \
                * jax.random.normal(zk, mu.shape)
        else:
            z = mu
        logits = jnp.dot(z, params["decoder"]["w"],
                         preferred_element_type=jnp.float32) \
            + params["decoder"]["b"]
        kl_weight = (self.gamma * jnp.sum(x, -1)) if self.gamma \
            else jnp.full(x.shape[0], self.beta)
        wn = jnp.maximum(jnp.sum(w), 1.0)
        mll = jnp.sum(jnp.sum(jax.nn.log_softmax(logits, -1) * x, -1) * w) / wn
        # stop-gradient through the old-encoder prior (frozen in the reference)
        prior = self._prior_logp(
            jax.tree.map(jax.lax.stop_gradient, params), x, z)
        kld = jnp.sum(jnp.sum(_log_norm_pdf(z, mu, logvar) - prior, -1)
                      * kl_weight * w) / wn
        return -(mll - kld)

    def calculate_loss(self, params, batch, rng=None):
        return self._loss(params, batch, rng, self.dropout_prob)

    def calculate_loss_no_dropout(self, params, batch, rng=None):
        return self._loss(params, batch, rng, 0.0)

    def update_prior(self, params):
        """Copy the live encoder into the frozen old encoder (parity:
        RecVAE.update_prior via RecVAETrainer, trainer.py:1016)."""
        out = dict(params)
        out["encoder_old"] = jax.tree.map(jnp.copy, params["encoder"])
        return out

    def full_sort_predict(self, params, batch):
        x = self._rating_matrix(batch[self.USER_ID])
        mu, _ = self._encode(params["encoder"], x, 0.0, None)
        return jnp.dot(mu, params["decoder"]["w"],
                       preferred_element_type=jnp.float32) \
            + params["decoder"]["b"]

    def predict(self, params, batch):
        scores = self.full_sort_predict(params, batch)
        return jnp.take_along_axis(scores, batch[self.ITEM_ID][:, None], 1)[:, 0]
