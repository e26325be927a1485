"""NPE: neural personalized embedding.

Parity target: reference NPE (recbole/model/sequential_recommender/npe.py)
— ReLU(user embedding) + ReLU(sum of sequence item embeddings), scored against
a separate item output embedding, with dropout.
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
    item_embedding_key = "item_out_embedding"
    default_config = {"embedding_size": 64, "loss_type": "CE",
                      "dropout_prob": 0.3, "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.dropout_prob = config["dropout_prob"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ks = jax.random.split(rng, 3)
        D = self.embedding_size
        return {
            "user_embedding": embedding_init(ks[0], self.n_users, D),
            "item_embedding": embedding_init(ks[1], self.n_items, D),
            "item_out_embedding": embedding_init(ks[2], self.n_items, D),
        }

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        valid = (jnp.arange(seq.shape[1])[None, :]
                 < batch[self.ITEM_SEQ_LEN][:, None]).astype(jnp.float32)
        s = jnp.sum(params["item_embedding"][seq] * valid[:, :, None], 1)
        u = params["user_embedding"][batch[self.USER_ID]]
        out = jax.nn.relu(u) + jax.nn.relu(s)
        if rng is not None and self.dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            out = dropout_apply(dk, out, self.dropout_prob)
        return out
