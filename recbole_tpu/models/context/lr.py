"""LR: logistic regression over all fields.

Parity target: reference LR (recbole/model/context_aware_recommender/lr.py) —
first-order linear term only, sigmoid + BCE.
"""

import jax

from ..losses import bce_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("LR")
class LR(ContextRecommender):
    default_config = {"embedding_size": 10}

    def init_params(self, rng):
        return self.init_context_params(rng)

    def calculate_loss(self, params, batch, rng=None):
        return bce_loss(self.first_order(params, batch), batch[self.LABEL],
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(self.first_order(params, batch))
