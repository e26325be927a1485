"""DeepFM: FM + deep MLP tower sharing one field embedding.

Parity target: reference DeepFM (recbole/model/context_aware_recommender/deepfm.py)
— y = first_order + FM(emb) + MLP(flatten(emb)), sigmoid + BCE.
"""

import jax
import jax.numpy as jnp

from ..layers import fm_pairwise, mlp_init, mlp_apply, xavier_normal
from ..losses import bce_loss
from .. import register_model
from .context_base import ContextRecommender


@register_model("DeepFM")
class DeepFM(ContextRecommender):
    default_config = {"embedding_size": 10, "mlp_hidden_size": [128, 128, 128],
                      "dropout_prob": 0.2}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.mlp_hidden = list(config["mlp_hidden_size"])
        self.dropout_prob = config["dropout_prob"]

    def init_params(self, rng):
        kc, km, ko = jax.random.split(rng, 3)
        params = self.init_context_params(kc)
        in_dim = self.num_fields * self.embedding_size
        params["mlp"] = mlp_init(km, [in_dim] + self.mlp_hidden, "xavier_normal")
        params["deep_out_w"] = xavier_normal(ko, (self.mlp_hidden[-1], 1))
        params["deep_out_b"] = jnp.zeros(1)
        return params

    def _logits(self, params, batch, rng=None):
        emb, linear = self.embed_and_first_order(params, batch)  # fused gather
        y_fm = linear + fm_pairwise(emb)
        h = mlp_apply(params["mlp"], emb.reshape(emb.shape[0], -1),
                      act="relu", dropout=self.dropout_prob, rng=rng)
        y_deep = jnp.dot(h, params["deep_out_w"],
                         preferred_element_type=jnp.float32)[:, 0] \
            + params["deep_out_b"][0]
        return y_fm + y_deep

    def calculate_loss(self, params, batch, rng=None):
        return bce_loss(self._logits(params, batch, rng), batch[self.LABEL],
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch))
