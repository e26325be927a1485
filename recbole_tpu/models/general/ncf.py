"""NCF: neural collaborative filtering, GMF + MLP towers (fork model).

Parity target: fork NCF (recbole/model/general_recommender/ncf.py:10-100) —
an MLP tower halving width per layer plus a GMF tower, joined by an affine
output. NOTE: the fork's forward looks its gmf_item_embedding up with the
USER ids (ncf.py:57) — a bug, but one its published behavior embeds, so we
replicate it by default; set ncf_fix_gmf_item_lookup: True for the intended
item lookup.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import normal_init, mlp_init, xavier_uniform
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("NCF")
class NCF(GeneralRecommender):
    input_type = InputType.POINTWISE
    default_config = {"mlp_embedding_dimension": 128,
                      "gmf_embedding_dimension": 128,
                      "weight_decay": 1e-8, "mlp_n_layers": 3,
                      "valid_metric": "Hit@10",
                      "ncf_fix_gmf_item_lookup": False}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.gmf_dim = config["gmf_embedding_dimension"]
        self.mlp_dim = config["mlp_embedding_dimension"]
        self.n_layers = config["mlp_n_layers"]
        self.fix_gmf_item_lookup = bool(config["ncf_fix_gmf_item_lookup"])
        dims = [self.mlp_dim * 2]
        for _ in range(self.n_layers):
            dims.append(dims[-1] // 2)
        self.mlp_dims = dims

    def init_params(self, rng):
        k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
        return {
            "mlp_user_embedding": normal_init(k1, (self.n_users, self.mlp_dim)),
            "mlp_item_embedding": normal_init(k2, (self.n_items, self.mlp_dim)),
            "gmf_user_embedding": normal_init(k3, (self.n_users, self.gmf_dim)),
            "gmf_item_embedding": normal_init(k4, (self.n_items, self.gmf_dim)),
            "mlp": mlp_init(k5, self.mlp_dims, "xavier_uniform"),
            "out_w": xavier_uniform(k6, (self.mlp_dims[-1] + self.gmf_dim, 1)),
            "out_b": jnp.zeros(1),
        }

    def _logits(self, params, user, item):
        mu = params["mlp_user_embedding"][user]
        mi = params["mlp_item_embedding"][item]
        x = jnp.concatenate([mu, mi], -1)
        for layer in params["mlp"]:
            x = jax.nn.relu(
                jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
                + layer["b"])
        gu = params["gmf_user_embedding"][user]
        # reference quirk: item table indexed by USER ids (ncf.py:57)
        gi = params["gmf_item_embedding"][
            item if self.fix_gmf_item_lookup else user]
        joint = jnp.concatenate([x, gu * gi], -1)
        return jnp.dot(joint, params["out_w"],
                       preferred_element_type=jnp.float32)[:, 0] + params["out_b"][0]

    def calculate_loss(self, params, batch, rng=None):
        logits = self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID])
        return bce_loss(logits, batch[self.LABEL], batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID]))
