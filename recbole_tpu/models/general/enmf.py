"""ENMF: efficient neural matrix factorization (whole-data training).

Parity target: reference ENMF (recbole/model/general_recommender/enmf.py) —
per-user batches; positive part scores every item in the user's history
through an H_i projection; the negative part is the closed-form all-(user,
item) sum computed as an (D x D) Gram-matrix triple product (enmf.py:78-95),
weighted by negative_weight. No sampling anywhere.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import xavier_normal, dropout_apply
from ...utils.enums import InputType
from .. import register_model


@register_model("ENMF")
class ENMF(GeneralRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("user_embedding", "item_embedding")
    input_type = InputType.LISTWISE
    train_batch_kind = "user"
    default_config = {"embedding_size": 64, "dropout_prob": 0.7,
                      "reg_weight": 0.0, "negative_weight": 0.5,
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.dropout_prob = config["dropout_prob"]
        self.reg_weight = config["reg_weight"]
        self.neg_weight = config["negative_weight"]
        hist, hlen = dataset.history_item_matrix()
        self.hist = self.register_const("hist", hist)
        self.hlen = self.register_const("hlen", hlen)

    def init_params(self, rng):
        ku, ki, kh = jax.random.split(rng, 3)
        D = self.embedding_size
        return {
            "user_embedding": xavier_normal(ku, (self.n_users, D)).at[0].set(0.0),
            "item_embedding": xavier_normal(ki, (self.n_items, D)).at[0].set(0.0),
            "h": xavier_normal(kh, (D, 1)),
        }

    def calculate_loss(self, params, batch, rng=None):
        user = batch[self.USER_ID]
        w = batch.get("_weight")
        w = jnp.ones(user.shape[0]) if w is None else w
        u = params["user_embedding"][user]
        if rng is not None and self.dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            u = dropout_apply(dk, u, self.dropout_prob)
        items = self.hist[user]                                 # (B, P)
        valid = (jnp.arange(items.shape[1])[None, :]
                 < self.hlen[user][:, None]).astype(jnp.float32)
        ie = params["item_embedding"][items]                    # (B, P, D)
        pos = jnp.dot(u[:, None, :] * ie, params["h"])[:, :, 0]  # (B, P)
        pos_part = jnp.sum(
            ((1.0 - self.neg_weight) * jnp.square(pos) - 2.0 * pos)
            * valid * w[:, None])

        # closed-form negative part over ALL (user, item) pairs (the reference
        # uses the FULL tables each batch, enmf.py:78-90):
        # sum_{u,i} (h^T (u ∘ i))^2 = sum_{d,d'} (U^T U)(I^T I)(h h^T)
        user_gram = jnp.dot(params["user_embedding"].T,
                            params["user_embedding"],
                            preferred_element_type=jnp.float32)
        item_gram = jnp.dot(params["item_embedding"].T,
                            params["item_embedding"],
                            preferred_element_type=jnp.float32)
        h_gram = jnp.dot(params["h"], params["h"].T)
        neg_part = self.neg_weight * jnp.sum(user_gram * item_gram * h_gram)

        reg = self.reg_weight * (jnp.linalg.norm(params["user_embedding"])
                                 + jnp.linalg.norm(params["item_embedding"]))
        return pos_part + neg_part + reg

    def predict(self, params, batch):
        u = params["user_embedding"][batch[self.USER_ID]]
        v = params["item_embedding"][batch[self.ITEM_ID]]
        return jnp.dot(u * v, params["h"])[:, 0]

    def full_sort_predict(self, params, batch):
        u = params["user_embedding"][batch[self.USER_ID]]       # (B, D)
        weighted = params["item_embedding"] * params["h"][:, 0][None, :]
        return jnp.dot(u, weighted.T, preferred_element_type=jnp.float32)
