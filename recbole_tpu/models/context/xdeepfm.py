"""xDeepFM: Compressed Interaction Network + deep tower + linear.

Parity target: reference xDeepFM
(recbole/model/context_aware_recommender/xdeepfm.py) — CIN layers compute
outer-product feature maps compressed by 1x1 convs (here: einsum + matmul,
which is exactly what a 1x1 conv is on the MXU); direct/split variants;
L2 reg on parameters.
"""

import jax
import jax.numpy as jnp

from ..layers import mlp_init, mlp_apply, xavier_normal
from ..losses import bce_loss, fro_norm, reg_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("xDeepFM")
class XDeepFM(ContextRecommender):
    default_config = {"embedding_size": 10, "mlp_hidden_size": [128, 128, 128],
                      "reg_weight": 5e-4, "dropout_prob": 0.2, "direct": False,
                      "cin_layer_size": [100, 100, 100],
                      # the reference keeps its CIN conv1ds in a plain python
                      # list (xdeepfm.py:57-61) — they never reach the
                      # optimizer and stay FROZEN at init; True opts into
                      # actually training them
                      "train_cin_weights": False}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.mlp_hidden = list(config["mlp_hidden_size"])
        self.reg_weight = config["reg_weight"]
        self.dropout_prob = config["dropout_prob"]
        self.train_cin = bool(config["train_cin_weights"])
        self.direct = config["direct"]
        self.cin_sizes = list(config["cin_layer_size"])
        if not self.direct:
            # halved maps feed the next layer; odd sizes are rounded down
            # (parity with the reference's split behavior)
            self.cin_sizes = [s // 2 * 2 for s in self.cin_sizes]

    def init_params(self, rng):
        ks = jax.random.split(rng, 4 + len(self.cin_sizes))
        params = self.init_context_params(ks[0])
        in_dim = self.num_fields * self.embedding_size
        # the reference's deep tower puts the final 1-unit projection
        # INSIDE MLPLayers (xdeepfm.py:68-69), so relu follows it too
        params["mlp"] = mlp_init(ks[1], [in_dim] + self.mlp_hidden + [1],
                                 "xavier_normal")
        cin = []
        prev = self.num_fields
        final_maps = 0
        for li, size in enumerate(self.cin_sizes):
            cin.append({
                "w": xavier_normal(ks[3 + li], (self.num_fields * prev, size)),
                "b": jnp.zeros(size)})
            if self.direct:
                final_maps += size
                prev = size
            else:
                final_maps += size // 2 if li < len(self.cin_sizes) - 1 else size
                prev = size // 2 if li < len(self.cin_sizes) - 1 else size
        params["cin_out_w"] = xavier_normal(ks[-1], (final_maps, 1))
        if self.train_cin:
            params["cin"] = cin
        else:
            # frozen under _const: the trainer's masked optimizer never
            # updates that subtree (reference keeps these out of the
            # optimizer entirely)
            params.setdefault("_const", {})["cin"] = cin
        return params

    def _cin_weights(self, params):
        return params["cin"] if "cin" in params else params["_const"]["cin"]

    def _cin(self, params, x0):
        """x0: (B, F, D). Returns (B, sum_maps) pooled CIN features."""
        B, F, D = x0.shape
        x = x0
        outs = []
        cin_ws = self._cin_weights(params)
        for li, lyr in enumerate(cin_ws):
            # outer product along the field axes: (B, F*Hl, D)
            z = jnp.einsum("bhd,bfd->bhfd", x, x0,
                           preferred_element_type=jnp.float32)
            z = z.reshape(B, -1, D)
            # 1x1 conv over the map axis == matmul on the MXU
            h = jnp.einsum("bmd,mn->bnd", z, lyr["w"],
                           preferred_element_type=jnp.float32) \
                + lyr["b"][None, :, None]
            # reference CIN activation is IDENTITY (xdeepfm.py:115-150)
            if self.direct:
                outs.append(h)
                x = h
            else:
                if li < len(cin_ws) - 1:
                    half = h.shape[1] // 2
                    x, keep = h[:, :half], h[:, half:]
                else:
                    keep = h
                    x = h
                outs.append(keep)
        pooled = jnp.concatenate([o.sum(-1) for o in outs], axis=1)
        return pooled

    def _logits(self, params, batch, rng=None):
        emb, linear = self.embed_and_first_order(params, batch)
        B = emb.shape[0]
        cin = jnp.dot(self._cin(params, emb), params["cin_out_w"],
                      preferred_element_type=jnp.float32)[:, 0]
        deep = mlp_apply(params["mlp"], emb.reshape(B, -1), act="relu",
                         dropout=self.dropout_prob, rng=rng)[:, 0]
        return linear + cin + deep

    def calculate_loss(self, params, batch, rng=None):
        loss = bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))
        # parity: reference xdeepfm.py:90-114 — per-tensor Frobenius norms of
        # the MLP weights, the first-order linear tables (our merged
        # token/float/seq bias tables stand in for its FMFirstOrderLinear
        # embeddings), and the CIN conv kernels
        fo_tables = [params[k] for k in ("float_weight", "seq_bias")
                     if k in params]
        if "token_embedding" in params:
            # merged storage: the token first-order bias is column D of the
            # embedding table (context_base.init_context_params)
            fo_tables.append(params["token_embedding"][:, -1])
        reg = (reg_loss([l["w"] for l in params["mlp"]])
               + sum(fro_norm(t) for t in fo_tables)
               + reg_loss([lyr["w"] for lyr in self._cin_weights(params)]))
        return loss + self.reg_weight * reg

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
