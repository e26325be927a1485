"""NPE: neural personalized embedding.

Parity target: reference NPE (recbole/model/sequential_recommender/npe.py)
— dropout(ReLU(user emb)) + dropout(ReLU(sum of sequence item embs)), scored
against ReLU of the SAME item table (npe.py:84-96; its embedding_seq_item
parameter is dead weight there and is not replicated).
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, dropout_apply
from ...utils.enums import InputType
from .. import register_model


@register_model("NPE")
class NPE(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"embedding_size": 64, "loss_type": "CE",
                      "dropout_prob": 0.3, "training_neg_sample_num": 0}

    def _item_table(self, params):
        # scoring goes through ReLU of the item table (reference npe.py:84-96)
        return jax.nn.relu(params["item_embedding"])

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.dropout_prob = config["dropout_prob"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ks = jax.random.split(rng, 2)
        D = self.embedding_size
        return {
            "user_embedding": embedding_init(ks[0], self.n_users, D),
            "item_embedding": embedding_init(ks[1], self.n_items, D),
        }

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        # pads are zero rows (pinned), so the plain sum matches the reference
        s = jnp.sum(self.embed_seq(params, seq), 1)
        u = params["user_embedding"][batch[self.USER_ID]]
        u = jax.nn.relu(u)
        s = jax.nn.relu(s)
        if rng is not None and self.dropout_prob > 0:
            # independent dropout per term (reference npe.py:67-75)
            rng, ku, ks_ = jax.random.split(rng, 3)
            u = dropout_apply(ku, u, self.dropout_prob)
            s = dropout_apply(ks_, s, self.dropout_prob)
        return u + s
