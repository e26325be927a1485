"""AutoInt: self-attentive feature interaction.

Parity target: reference AutoInt
(recbole/model/context_aware_recommender/autoint.py) — project field
embeddings to an attention space, stack multi-head self-attention layers with
residual connections over the FIELD axis, plus a deep MLP and the linear term.
"""

import jax
import jax.numpy as jnp

from ..layers import mlp_init, mlp_apply, xavier_normal
from ..losses import bce_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("AutoInt")
class AutoInt(ContextRecommender):
    default_config = {"embedding_size": 10, "attention_size": 16, "n_layers": 3,
                      "num_heads": 2, "dropout_probs": [0.2, 0.2, 0.2],
                      "mlp_hidden_size": [128, 128]}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.attention_size = config["attention_size"]
        self.n_layers = config["n_layers"]
        self.num_heads = config["num_heads"]
        self.dropouts = list(config["dropout_probs"])
        self.mlp_hidden = list(config["mlp_hidden_size"])

    def init_params(self, rng):
        ks = jax.random.split(rng, 5 + 4 * self.n_layers)
        params = self.init_context_params(ks[0])
        A = self.attention_size
        params["proj_w"] = xavier_normal(ks[1], (self.embedding_size, A))
        params["proj_b"] = jnp.zeros(A)
        params["attn"] = []
        for li in range(self.n_layers):
            params["attn"].append({
                "wq": xavier_normal(ks[2 + 4 * li], (A, A)),
                "wk": xavier_normal(ks[3 + 4 * li], (A, A)),
                "wv": xavier_normal(ks[4 + 4 * li], (A, A)),
                "wo": xavier_normal(ks[5 + 4 * li], (A, A)),
                "bq": jnp.zeros(A), "bk": jnp.zeros(A),
                "bv": jnp.zeros(A), "bo": jnp.zeros(A),
            })
        in_dim = self.num_fields * self.embedding_size
        params["mlp"] = mlp_init(ks[-3], [in_dim] + self.mlp_hidden,
                                 "xavier_normal")
        params["mlp_out_w"] = xavier_normal(ks[-2], (self.mlp_hidden[-1], 1))
        params["mlp_out_b"] = jnp.zeros(1)
        params["attn_out_w"] = xavier_normal(
            ks[-1], (self.num_fields * self.attention_size, 1))
        params["attn_out_b"] = jnp.zeros(1)
        return params

    def _logits(self, params, batch, rng=None):
        emb, linear = self.embed_and_first_order(params, batch)  # fused gather
        B, F, _ = emb.shape
        H = self.num_heads
        A = self.attention_size
        hd = A // H
        x = jnp.dot(emb, params["proj_w"],
                    preferred_element_type=jnp.float32) + params["proj_b"]
        # torch nn.MultiheadAttention stack — scaled dot product, packed
        # qkv + out projection, NO inter-layer residual (the reference's
        # has_residual path is off by default and its v_res_embedding is a
        # typo'd dead branch, autoint.py:54-55, 88-90)
        for layer in params["attn"]:
            def heads(w, b):
                return (jnp.dot(x, w, preferred_element_type=jnp.float32)
                        + b).reshape(B, F, H, hd).transpose(0, 2, 1, 3)
            q = heads(layer["wq"], layer["bq"])
            k = heads(layer["wk"], layer["bk"])
            v = heads(layer["wv"], layer["bv"])
            scores = jax.nn.softmax(
                jnp.einsum("bhfd,bhgd->bhfg", q, k,
                           preferred_element_type=jnp.float32)
                / jnp.sqrt(jnp.float32(hd)), axis=-1)
            if rng is not None and self.dropouts[0] > 0:
                from ..layers import dropout_apply
                rng, dk = jax.random.split(rng)
                scores = dropout_apply(dk, scores, self.dropouts[0])
            ctx = jnp.einsum("bhfg,bhgd->bhfd", scores, v,
                             preferred_element_type=jnp.float32)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, F, A)
            x = jnp.dot(ctx, layer["wo"],
                        preferred_element_type=jnp.float32) + layer["bo"]
        x = jax.nn.relu(x)
        attn_term = (jnp.dot(x.reshape(B, -1), params["attn_out_w"],
                             preferred_element_type=jnp.float32)[:, 0]
                     + params["attn_out_b"][0])
        h = mlp_apply(params["mlp"], emb.reshape(B, -1), act="relu",
                      dropout=self.dropouts[1], rng=rng)
        deep = (jnp.dot(h, params["mlp_out_w"],
                        preferred_element_type=jnp.float32)[:, 0]
                + params["mlp_out_b"][0])
        return linear + attn_term + deep

    def calculate_loss(self, params, batch, rng=None):
        return bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
