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
        import numpy as np
        mat = train_data.dataset.inter_matrix("csr")
        X = mat.toarray().astype(np.float32)
        G = (X.T @ X).astype(np.float64)
        G += self.reg_weight * np.eye(G.shape[0])
        # one-shot offline solve: float64 on host (jnp's fp32 inverse loses
        # ~3 decimal digits vs LAPACK here, enough to perturb rankings)
        P = np.linalg.inv(G)
        B = P / (-np.diag(P))
        np.fill_diagonal(B, 0.0)
        return {"inter": jnp.asarray(X),
                "weight": jnp.asarray(B.astype(np.float32))}

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
