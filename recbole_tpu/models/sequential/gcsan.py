"""GCSAN: graph-contextualized self-attention for session recommendation.

Parity target: reference GCSAN (recbole/model/sequential_recommender/gcsan.py)
— session gated GNN (no edge biases), causal Transformer self-attention over
the aliased node sequence, final repr = weight*attn_last + (1-weight)*gnn_last,
plus L2 embedding regularization.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import (embedding_init, transformer_init, transformer_apply,
                      causal_attention_mask)
from ..losses import bpr_loss, ce_loss, emb_loss
from ...utils.enums import InputType
from .. import register_model
from .session_graph import session_graph, gnn_init, gnn_apply


@register_model("GCSAN")
class GCSAN(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    default_config = {"n_layers": 1, "n_heads": 1, "hidden_size": 64,
                      "inner_size": 256, "hidden_dropout_prob": 0.2,
                      "attn_dropout_prob": 0.2, "hidden_act": "gelu",
                      "layer_norm_eps": 1e-12, "initializer_range": 0.02,
                      "step": 1, "weight": 0.6, "reg_weight": 5e-5,
                      "loss_type": "CE", "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.hidden_size = config["hidden_size"]
        self.n_layers = config["n_layers"]
        self.n_heads = config["n_heads"]
        self.inner_size = config["inner_size"]
        self.hidden_act = config["hidden_act"]
        self.step = config["step"]
        self.weight = config["weight"]
        self.reg_weight = config["reg_weight"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ks = jax.random.split(rng, 3)
        D = self.hidden_size
        return {
            "item_embedding": embedding_init(ks[0], self.n_items, D),
            "gnn": gnn_init(ks[1], D, bias_edges=False),
            "encoder": transformer_init(ks[2], self.n_layers, self.n_heads,
                                        D, self.inner_size),
        }

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        L = seq.shape[1]
        alias, a_in, a_out = session_graph(seq, seq_len)
        hidden = self.embed_seq(params, seq)
        hidden = gnn_apply(params["gnn"], a_in, a_out, hidden, self.step)
        seq_hidden = jnp.take_along_axis(
            hidden, alias[:, :, None].astype(jnp.int32), axis=1)
        ht = self.gather_last(seq_hidden, seq_len)
        key_valid = (jnp.arange(L)[None, :] < seq_len[:, None]) \
            .astype(jnp.int32)
        out = transformer_apply(params["encoder"], seq_hidden, None,
                                self.n_heads, act=self.hidden_act,
                                mask_spec=(key_valid, True),
                                fused=self.config["fused_attention"])
        at = self.gather_last(out, seq_len)
        return self.weight * at + (1 - self.weight) * ht

    def calculate_loss(self, params, batch, rng=None):
        out = self.forward(params, batch, rng)
        pos = batch[self.POS_ITEM_ID]
        w = batch.get("_weight")
        table = params["item_embedding"]
        if self.loss_type == "BPR":
            neg = batch[self.NEG_ITEM_ID]
            main = bpr_loss(jnp.sum(out * table[pos], -1),
                            jnp.sum(out * table[neg], -1), w)
        else:
            logits = jnp.dot(out, table.T, preferred_element_type=jnp.float32)
            main = ce_loss(logits, pos, w)
        return main + self.reg_weight * emb_loss(table)
