"""SRGNN: session-based recommendation with graph neural networks.

Parity target: reference SRGNN (recbole/model/sequential_recommender/srgnn.py)
— session graph + gated GNN + attention readout (local ht + attended global a,
combined by a linear transform). The reference's host-side numpy graph
construction (`_get_slice`, srgnn.py:148-186) is replaced by the in-jit
builder in session_graph.py.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, xavier_uniform
from ...utils.enums import InputType
from .. import register_model
from .session_graph import session_graph, gnn_init, gnn_apply


@register_model("SRGNN")
class SRGNN(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"embedding_size": 64, "step": 1, "loss_type": "CE",
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.step = config["step"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ks = jax.random.split(rng, 6)
        D = self.embedding_size
        return {
            "item_embedding": embedding_init(ks[0], self.n_items, D),
            "gnn": gnn_init(ks[1], D, bias_edges=True),
            "w1": xavier_uniform(ks[2], (D, D)), "b1": jnp.zeros((D,)),
            "w2": xavier_uniform(ks[3], (D, D)), "b2": jnp.zeros((D,)),
            "w3": xavier_uniform(ks[4], (D, 1)),
            "wt": xavier_uniform(ks[5], (2 * D, D)), "bt": jnp.zeros((D,)),
        }

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        alias, a_in, a_out = session_graph(seq, seq_len)
        hidden = self.embed_seq(params, seq)                  # node slots
        hidden = gnn_apply(params["gnn"], a_in, a_out, hidden, self.step)
        seq_hidden = jnp.take_along_axis(
            hidden, alias[:, :, None].astype(jnp.int32), axis=1)
        ht = self.gather_last(seq_hidden, seq_len)
        q1 = jnp.dot(ht, params["w1"]) + params["b1"]           # (B, D)
        q2 = jnp.dot(seq_hidden, params["w2"]) + params["b2"]   # (B, L, D)
        alpha = jnp.dot(jax.nn.sigmoid(q1[:, None, :] + q2), params["w3"])
        valid = (jnp.arange(seq.shape[1])[None, :]
                 < seq_len[:, None]).astype(jnp.float32)
        a = jnp.sum(alpha * seq_hidden * valid[:, :, None], axis=1)
        return jnp.dot(jnp.concatenate([a, ht], axis=-1), params["wt"]) \
            + params["bt"]
