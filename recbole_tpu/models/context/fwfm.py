"""FwFM: field-weighted factorization machine.

Parity target: reference FwFM (recbole/model/context_aware_recommender/fwfm.py)
— FM pairwise interactions with a learned scalar weight per FIELD PAIR.

Deliberate deviation: the reference's fwfm_layer (fwfm.py:101-121) draws a
FRESH torch.randn pair-weight tensor on every forward call — the weights are
resampled noise that is never trained (the throwaway nn.Parameter never
reaches the optimizer). That is not reproducible even across two reference
runs; we implement the paper's actual formulation (one trained scalar per
field pair) instead.
"""

import jax
import jax.numpy as jnp

from ..losses import bce_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("FwFM")
class FwFM(ContextRecommender):
    default_config = {"embedding_size": 10, "dropout_prob": 0.0, "fields": None}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        F = self.num_fields
        ii, jj = jnp.triu_indices(F, k=1)
        self.pair_i, self.pair_j = ii, jj

    def init_params(self, rng):
        params = self.init_context_params(rng)
        params["pair_weight"] = jnp.zeros(len(self.pair_i))
        return params

    def _logits(self, params, batch, rng=None):
        emb, linear = self.embed_and_first_order(params, batch)
        inner = jnp.sum(emb[:, self.pair_i, :] * emb[:, self.pair_j, :], -1)
        inter = jnp.dot(inner, params["pair_weight"],
                        preferred_element_type=jnp.float32)
        return linear + inter

    def calculate_loss(self, params, batch, rng=None):
        return bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
