"""DMF: deep matrix factorization.

Parity target: reference DMF (recbole/model/general_recommender/dmf.py) —
user input = the user's interaction-matrix row, item input = the item's
column; separate linear towers; cosine similarity clipped from below; BCE
(ratings normalized by max when inter_matrix_type='rating').
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import mlp_init, xavier_normal
from ...utils.enums import InputType
from .. import register_model


@register_model("DMF")
class DMF(GeneralRecommender):
    input_type = InputType.POINTWISE
    default_config = {"inter_matrix_type": "01", "user_embedding_size": 64,
                      "item_embedding_size": 64,
                      "user_hidden_size_list": [64, 64],
                      "item_hidden_size_list": [64, 64]}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        # tower dims: [embedding_size] + hidden_size_list — the hidden list
        # counts LAYERS on top of the linear input projection (reference
        # dmf.py:77-80)
        self.user_hidden = ([config["user_embedding_size"]]
                            + list(config["user_hidden_size_list"]))
        self.item_hidden = ([config["item_embedding_size"]]
                            + list(config["item_hidden_size_list"]))
        if self.user_hidden[-1] != self.item_hidden[-1]:
            raise ValueError("tower output dims must match")
        value_field = (config["RATING_FIELD"]
                       if config["inter_matrix_type"] == "rating" else None)
        # build by last-wins assignment, NOT csr (which SUMS duplicate
        # (u, i) rows — the reference's scatter overwrites, dmf.py:104-108)
        uids = np.asarray(dataset.inter_feat[config["USER_ID_FIELD"]])
        iids = np.asarray(dataset.inter_feat[config["ITEM_ID_FIELD"]])
        vals = (np.asarray(dataset.inter_feat[value_field], np.float32)
                if value_field else np.ones(len(uids), np.float32))
        dense = np.zeros((self.n_users, self.n_items), np.float32)
        dense[uids, iids] = vals
        self.max_rating = float(dense.max()) if dense.size else 1.0
        self.R = self.register_const("R", dense)

    def init_params(self, rng):
        ku, ki, k1, k2 = jax.random.split(rng, 4)
        params = {
            "user_w0": xavier_normal(ku, (self.n_items, self.user_hidden[0])),
            "item_w0": xavier_normal(ki, (self.n_users, self.item_hidden[0])),
            "user_mlp": mlp_init(k1, self.user_hidden, "xavier_normal"),
            "item_mlp": mlp_init(k2, self.item_hidden, "xavier_normal"),
        }
        return params

    def _towers(self, params, user, item):
        u = jnp.dot(self.R[user], params["user_w0"],
                    preferred_element_type=jnp.float32)
        i = jnp.dot(self.R[:, item].T, params["item_w0"],
                    preferred_element_type=jnp.float32)
        for layer in params["user_mlp"]:
            u = jax.nn.relu(jnp.dot(u, layer["w"],
                                    preferred_element_type=jnp.float32)
                            + layer["b"])
        for layer in params["item_mlp"]:
            i = jax.nn.relu(jnp.dot(i, layer["w"],
                                    preferred_element_type=jnp.float32)
                            + layer["b"])
        return u, i

    def _cosine(self, u, i):
        # the fork replaced cosine similarity with sigmoid(dot) (reference
        # dmf.py:114-117: 'cosine distance is replaced by dot product')
        return jax.nn.sigmoid(jnp.sum(u * i, -1))

    def calculate_loss(self, params, batch, rng=None):
        u, i = self._towers(params, batch[self.USER_ID], batch[self.ITEM_ID])
        p = self._cosine(u, i)
        label = batch[self.LABEL] / self.max_rating
        w = batch.get("_weight")
        eps = 1e-7
        loss = -(label * jnp.log(p + eps) + (1 - label) * jnp.log(1 - p + eps))
        if w is None:
            return jnp.mean(loss)
        return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)

    def predict(self, params, batch):
        u, i = self._towers(params, batch[self.USER_ID], batch[self.ITEM_ID])
        return self._cosine(u, i)

    def full_sort_predict(self, params, batch):
        user = batch[self.USER_ID]
        u = jnp.dot(self.R[user], params["user_w0"],
                    preferred_element_type=jnp.float32)
        for layer in params["user_mlp"]:
            u = jax.nn.relu(jnp.dot(u, layer["w"],
                                    preferred_element_type=jnp.float32)
                            + layer["b"])
        i = jnp.dot(self.R.T, params["item_w0"],
                    preferred_element_type=jnp.float32)
        for layer in params["item_mlp"]:
            i = jax.nn.relu(jnp.dot(i, layer["w"],
                                    preferred_element_type=jnp.float32)
                            + layer["b"])
        return jax.nn.sigmoid(jnp.dot(u, i.T,
                                      preferred_element_type=jnp.float32))
