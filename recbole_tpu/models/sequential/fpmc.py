"""FPMC: factorized personalized Markov chains.

Parity target: reference FPMC (recbole/model/sequential_recommender/fpmc.py)
— score(u, last, i) = <UI_u, IU_i> + <IL_last, LI_i>, BPR pairwise.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init
from ..losses import bpr_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("FPMC")
class FPMC(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("LI",)
    input_type = InputType.PAIRWISE
    default_config = {"embedding_size": 64, "training_neg_sample_num": 1}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]

    def init_params(self, rng):
        ks = jax.random.split(rng, 4)
        D = self.embedding_size
        return {
            "UI": embedding_init(ks[0], self.n_users, D, "xavier_normal"),
            "IU": embedding_init(ks[1], self.n_items, D, "xavier_normal"),
            "IL": embedding_init(ks[2], self.n_items, D, "xavier_normal"),
            "LI": embedding_init(ks[3], self.n_items, D, "xavier_normal"),
        }

    def _last_item(self, batch):
        seq = batch[self.ITEM_SEQ]
        idx = jnp.clip(batch[self.ITEM_SEQ_LEN] - 1, 0, seq.shape[1] - 1)
        return jnp.take_along_axis(seq, idx[:, None], 1)[:, 0]

    def _score(self, params, batch, items):
        # roles match the reference (fpmc.py:68-92): the LAST CLICK is
        # embedded by LI (the padding_idx table), candidates by IU and IL
        u = params["UI"][batch[self.USER_ID]]
        last = params["LI"][self._last_item(batch)]
        return (jnp.sum(u * params["IU"][items], -1)
                + jnp.sum(last * params["IL"][items], -1))

    def calculate_loss(self, params, batch, rng=None):
        pos = self._score(params, batch, batch[self.POS_ITEM_ID])
        neg = self._score(params, batch, batch[self.NEG_ITEM_ID])
        return bpr_loss(pos, neg, batch.get("_weight"))

    def predict(self, params, batch):
        return self._score(params, batch, batch[self.ITEM_ID])

    def full_sort_predict(self, params, batch):
        u = params["UI"][batch[self.USER_ID]]
        last = params["LI"][self._last_item(batch)]
        return (jnp.dot(u, params["IU"].T, preferred_element_type=jnp.float32)
                + jnp.dot(last, params["IL"].T,
                          preferred_element_type=jnp.float32))
