"""FM: factorization machine CTR model.

Parity target: reference FM (recbole/model/context_aware_recommender/fm.py) —
first-order linear + second-order pairwise interactions, sigmoid + BCE.
"""

import jax

from ..base import AbstractRecommender
from ..layers import fm_pairwise
from ..losses import bce_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("FM")
class FM(ContextRecommender):
    default_config = {"embedding_size": 10}

    def init_params(self, rng):
        return self.init_context_params(rng)

    def _logits(self, params, batch):
        emb, linear = self.embed_and_first_order(params, batch)  # fused gather
        return linear + fm_pairwise(emb)

    def calculate_loss(self, params, batch, rng=None):
        return bce_loss(self._logits(params, batch), batch[self.LABEL],
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
