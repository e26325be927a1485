"""TransRec: translation-based recommendation.

Parity target: reference TransRec
(recbole/model/sequential_recommender/transrec.py) — items as points, users as
translation vectors (plus a shared global translation T): score(u, last, i) =
bias_i - ||last + u + T - i||^2; BPR pairwise.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init
from ..losses import bpr_loss, emb_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("TransRec")
class TransRec(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("user_embedding", "item_embedding", "item_bias")
    input_type = InputType.PAIRWISE
    default_config = {"embedding_size": 64, "training_neg_sample_num": 1}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]

    def init_params(self, rng):
        ku, ki, kt = jax.random.split(rng, 3)
        D = self.embedding_size
        return {
            "user_embedding": embedding_init(ku, self.n_users, D),
            "item_embedding": embedding_init(ki, self.n_items, D),
            "T": jax.random.normal(kt, (D,)) * 0.01,
            "item_bias": jnp.zeros(self.n_items),
        }

    def _last_item(self, batch):
        seq = batch[self.ITEM_SEQ]
        idx = jnp.clip(batch[self.ITEM_SEQ_LEN] - 1, 0, seq.shape[1] - 1)
        return jnp.take_along_axis(seq, idx[:, None], 1)[:, 0]

    def _translated(self, params, batch):
        last_e = params["item_embedding"][self._last_item(batch)]
        u_e = params["user_embedding"][batch[self.USER_ID]]
        return last_e + u_e + params["T"][None, :]

    def _score(self, params, batch, items):
        pred = self._translated(params, batch)
        i_e = params["item_embedding"][items]
        # score = bias − √Σ(x−y)² — true L2 distance, not squared
        # (parity: reference _l2_distance, transrec.py:55-56)
        return params["item_bias"][items] - jnp.sqrt(
            jnp.maximum(jnp.sum((pred - i_e) ** 2, -1), 1e-12))

    def calculate_loss(self, params, batch, rng=None):
        pos = self._score(params, batch, batch[self.POS_ITEM_ID])
        neg = self._score(params, batch, batch[self.NEG_ITEM_ID])
        w = batch.get("_weight")
        loss = bpr_loss(pos, neg, w)
        # parity: reference transrec.py:92-97 — EmbLoss on the DETACHED
        # pos-item / user / bias lookups (loss-value parity only; torch's
        # .detach() means no gradient flows) plus RegLoss on T (trains)
        pos_e = params["item_embedding"][batch[self.POS_ITEM_ID]]
        u_e = params["user_embedding"][batch[self.USER_ID]]
        b_e = params["item_bias"][batch[self.POS_ITEM_ID]][:, None]
        if w is not None:
            pos_e = pos_e * w[:, None]
            u_e = u_e * w[:, None]
            b_e = b_e * w[:, None]
        # reference reg_loss(self.T) hands RegLoss a bare 1-D tensor, whose
        # `for W in parameters` loop iterates ELEMENTS — Σ|T_d|, i.e. the L1
        # norm of T (verified numerically against the reference)
        reg = (emb_loss(jax.lax.stop_gradient(pos_e))
               + emb_loss(jax.lax.stop_gradient(u_e))
               + emb_loss(jax.lax.stop_gradient(b_e))
               + jnp.sum(jnp.abs(params["T"])))
        return loss + reg

    def predict(self, params, batch):
        return self._score(params, batch, batch[self.ITEM_ID])

    def score_items(self, params, batch, items):
        pred = self._translated(params, batch)                  # (B, D)
        i_e = params["item_embedding"][items]                   # (B, C, D)
        return params["item_bias"][items] - jnp.sqrt(
            jnp.maximum(jnp.sum((pred[:, None, :] - i_e) ** 2, -1), 1e-12))

    def full_sort_predict(self, params, batch):
        pred = self._translated(params, batch)
        items = params["item_embedding"]
        d = jnp.sum(pred ** 2, -1, keepdims=True) \
            - 2 * jnp.dot(pred, items.T, preferred_element_type=jnp.float32) \
            + jnp.sum(items ** 2, -1)[None, :]
        return params["item_bias"][None, :] - jnp.sqrt(jnp.maximum(d, 1e-12))
