"""SpectralCF: spectral collaborative filtering.

Parity target: reference SpectralCF
(recbole/model/general_recommender/spectralcf.py) — per layer
x' = sigmoid((I + A_hat) x W) over the normalized bipartite adjacency, layer
outputs concatenated; BPR + L2. Same COO segment-sum backbone as LightGCN.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import xavier_uniform
from ..losses import bpr_loss, emb_loss, mask_rows
from ...utils.enums import InputType
from .. import register_model
from .lightgcn import build_norm_adj


@register_model("SpectralCF")
class SpectralCF(GeneralRecommender):
    input_type = InputType.PAIRWISE
    default_config = {"embedding_size": 64, "n_layers": 4, "reg_weight": 1e-3}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.n_layers = config["n_layers"]
        self.reg_weight = config["reg_weight"]
        from ...ops.graph import BipartiteProp
        # A_hat = I + L = 2I − D⁻¹A (reference spectralcf.py:60-110: ROW
        # normalization, not symmetric)
        self.prop = BipartiteProp(dataset.inter_matrix("csr"),
                                  self.n_users, self.n_items, norm="rw")
        self.scan_epochs_ok = not self.prop.heavy
        self.n_nodes = self.n_users + self.n_items

    def init_params(self, rng):
        ks = jax.random.split(rng, 2 + self.n_layers)
        D = self.embedding_size
        return {
            "user_embedding": xavier_uniform(ks[0], (self.n_users, D)),
            "item_embedding": xavier_uniform(ks[1], (self.n_items, D)),
            "filters": [xavier_uniform(ks[2 + i], (D, D))
                        for i in range(self.n_layers)],
            "_const": self.prop.init_consts(),
        }

    def propagate(self, params):
        x = jnp.concatenate([params["user_embedding"],
                             params["item_embedding"]], 0)
        outs = [x]
        for w in params["filters"]:
            ax = self.prop(params["_const"], x)
            # A_hat x = 2x − (D⁻¹A)x
            x = jax.nn.sigmoid(jnp.dot(2.0 * x - ax, w,
                                       preferred_element_type=jnp.float32))
            outs.append(x)
        final = jnp.concatenate(outs, -1)
        return final[:self.n_users], final[self.n_users:]

    def calculate_loss(self, params, batch, rng=None):
        ue, ie = self.propagate(params)
        u, pos, neg = (batch[self.USER_ID], batch[self.ITEM_ID],
                       batch[self.NEG_ITEM_ID])
        w = batch.get("_weight")
        loss = bpr_loss(jnp.sum(ue[u] * ie[pos], -1),
                        jnp.sum(ue[u] * ie[neg], -1), w)
        reg = emb_loss(*mask_rows(w, ue[u], ie[pos], ie[neg]))
        return loss + self.reg_weight * reg

    def predict(self, params, batch):
        ue, ie = self.propagate(params)
        return jnp.sum(ue[batch[self.USER_ID]] * ie[batch[self.ITEM_ID]], -1)

    def full_sort_predict(self, params, batch):
        ue, ie = self.propagate(params)
        return jnp.dot(ue[batch[self.USER_ID]], ie.T,
                       preferred_element_type=jnp.float32)
