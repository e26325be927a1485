"""Pop: recommend by global item popularity.

Parity target: reference Pop (recbole/model/general_recommender/pop.py) —
TRADITIONAL type, 'params' are the train-split interaction counts per item.
"""

import numpy as np
import jax.numpy as jnp

from ..base import GeneralRecommender
from ...utils.enums import ModelType, InputType
from .. import register_model


@register_model("Pop")
class Pop(GeneralRecommender):
    type = ModelType.TRADITIONAL
    input_type = InputType.POINTWISE
    default_config = {"training_neg_sample_num": 0}

    def fit_params(self, rng, train_data):
        iids = np.asarray(train_data.dataset.inter_feat[self.ITEM_ID])
        cnt = np.bincount(iids, minlength=self.n_items).astype(np.float32)
        cnt[0] = 0.0
        return {"item_cnt": jnp.asarray(cnt / max(cnt.max(), 1.0))}

    def init_params(self, rng):
        return {"item_cnt": jnp.zeros(self.n_items, jnp.float32)}

    def calculate_loss(self, params, batch, rng=None):
        return jnp.zeros(())

    def predict(self, params, batch):
        return params["item_cnt"][batch[self.ITEM_ID]]

    def full_sort_predict(self, params, batch):
        B = batch[self.USER_ID].shape[0]
        return jnp.broadcast_to(params["item_cnt"][None, :], (B, self.n_items))
