"""BPR: Bayesian Personalized Ranking matrix factorization.

Parity target: reference BPR (recbole/model/general_recommender/bpr.py:27-100):
user/item embedding tables, pairwise BPR loss, full-sort scores = U @ V^T.
The full-sort matmul is the MXU sweet spot; embedding tables can be row-sharded
over the mesh 'model' axis (see parallel/mesh.py) for large vocabularies.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import embedding_init, embed
from ..losses import bpr_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("BPR")
class BPR(GeneralRecommender):
    input_type = InputType.PAIRWISE
    default_config = {"embedding_size": 64}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]

    def init_params(self, rng):
        ku, ki = jax.random.split(rng)
        return {
            "user_embedding": embedding_init(ku, self.n_users, self.embedding_size),
            "item_embedding": embedding_init(ki, self.n_items, self.embedding_size),
        }

    def calculate_loss(self, params, batch, rng=None):
        u = embed(params["user_embedding"], batch[self.USER_ID])
        pos = embed(params["item_embedding"], batch[self.ITEM_ID])
        neg = embed(params["item_embedding"], batch[self.NEG_ITEM_ID])
        pos_score = jnp.sum(u * pos, axis=-1)
        neg_score = jnp.sum(u * neg, axis=-1)
        return bpr_loss(pos_score, neg_score, batch.get("_weight"))

    def predict(self, params, batch):
        u = embed(params["user_embedding"], batch[self.USER_ID])
        i = embed(params["item_embedding"], batch[self.ITEM_ID])
        return jnp.sum(u * i, axis=-1)

    def full_sort_predict(self, params, batch):
        u = embed(params["user_embedding"], batch[self.USER_ID])
        return jnp.dot(u, params["item_embedding"].T,
                       preferred_element_type=jnp.float32)

    def full_sort_query(self, params, batch):
        """Dot-product structure exposed for the fused eval path."""
        return (embed(params["user_embedding"], batch[self.USER_ID]),
                params["item_embedding"])
