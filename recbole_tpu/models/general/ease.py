"""EASE: Embarrassingly Shallow Autoencoder (closed-form ridge regression).

Parity target: reference EASE (recbole/model/general_recommender/ease.py) —
B = I - P / diag(P), P = (X^T X + reg*I)^-1, diagonal of B forced to zero.
The (n_items, n_items) solve runs on device via Cholesky.
"""

import jax.numpy as jnp

from ..base import GeneralRecommender
from ...utils.enums import ModelType, InputType
from .. import register_model


@register_model("EASE")
class EASE(GeneralRecommender):
    type = ModelType.TRADITIONAL
    input_type = InputType.POINTWISE
    default_config = {"reg_weight": 250.0, "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.reg_weight = config["reg_weight"]

    def fit_params(self, rng, train_data):
        mat = train_data.dataset.inter_matrix("csr")
        X = jnp.asarray(mat.toarray(), jnp.float32)
        G = jnp.dot(X.T, X, preferred_element_type=jnp.float32)
        G = G + self.reg_weight * jnp.eye(G.shape[0], dtype=jnp.float32)
        P = jnp.linalg.inv(G)
        B = -P / jnp.diag(P)[:, None]
        B = B - jnp.diag(jnp.diag(B))
        return {"inter": X, "weight": B}

    def init_params(self, rng):
        return {"inter": jnp.zeros((self.n_users, self.n_items), jnp.float32),
                "weight": jnp.zeros((self.n_items, self.n_items), jnp.float32)}

    def calculate_loss(self, params, batch, rng=None):
        return jnp.zeros(())

    def predict(self, params, batch):
        u_rows = params["inter"][batch[self.USER_ID]]
        w_cols = params["weight"][:, batch[self.ITEM_ID]].T    # (B, n_items)
        return jnp.sum(u_rows * w_cols, axis=-1)

    def full_sort_predict(self, params, batch):
        u_rows = params["inter"][batch[self.USER_ID]]
        return jnp.dot(u_rows, params["weight"],
                       preferred_element_type=jnp.float32)
