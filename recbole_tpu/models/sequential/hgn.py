"""HGN: hierarchical gating network.

Parity target: reference HGN (recbole/model/sequential_recommender/hgn.py)
— feature gating (per-dim sigmoid gate from item+user), instance gating
(per-position gate), pooled (avg/max), plus user term and item-item term;
BPR loss by default with L2 regs.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, xavier_uniform
from ..losses import fro_norm
from ...utils.enums import InputType
from .. import register_model


@register_model("HGN")
class HGN(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    item_embedding_key = "item_out_embedding"
    default_config = {"embedding_size": 64, "loss_type": "BPR",
                      "pooling_type": "average", "reg_weight": [0.0, 0.0],
                      "training_neg_sample_num": 1}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.pooling_type = config["pooling_type"]
        self.reg_weight = config["reg_weight"]
        self.loss_type = config["loss_type"]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)

    def init_params(self, rng):
        ks = jax.random.split(rng, 7)
        D, L = self.embedding_size, self.max_seq_length
        return {
            "user_embedding": embedding_init(ks[0], self.n_users, D),
            "item_embedding": embedding_init(ks[1], self.n_items, D),
            "item_out_embedding": embedding_init(ks[2], self.n_items, D),
            "w1": xavier_uniform(ks[3], (D, D)),
            "w2": xavier_uniform(ks[4], (D, D)),
            "b": jnp.zeros(D),
            "w3": xavier_uniform(ks[5], (D,)),
            "w4": xavier_uniform(ks[6], (L, D)),
        }

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        emb = self.embed_seq(params, seq)                    # (B, L, D)
        u = params["user_embedding"][batch[self.USER_ID]]      # (B, D)
        # No position masks anywhere — parity with reference hgn.py:99-164,
        # which relies on the padding_idx=0 item row staying all-zero (our
        # pad_zero_params pin): padded positions contribute zero VALUES while
        # their instance-gate scores still enter the average's denominator
        # and the max's argmax, exactly like the reference.
        fg = jax.nn.sigmoid(
            jnp.einsum("bld,dk->blk", emb, params["w1"],
                       preferred_element_type=jnp.float32)
            + jnp.dot(u, params["w2"])[:, None, :] + params["b"])
        gated = emb * fg
        # instance gating: (B, L)
        ig = jax.nn.sigmoid(
            jnp.einsum("bld,d->bl", gated, params["w3"],
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bd,ld->bl", u, params["w4"],
                         preferred_element_type=jnp.float32))
        inst = gated * ig[:, :, None]
        if self.pooling_type == "max":
            idx = jnp.argmax(ig, axis=1)
            pooled = jnp.take_along_axis(
                inst, idx[:, None, None].astype(jnp.int32), 1)[:, 0]
        else:
            pooled = jnp.sum(inst, 1) / jnp.maximum(
                jnp.sum(ig, 1, keepdims=True), 1e-8)
        # item-item term: sum of raw history embeddings (pads are zero rows)
        hist_sum = jnp.sum(emb, 1)
        return u + pooled + hist_sum

    def calculate_loss(self, params, batch, rng=None):
        from ..losses import bpr_loss, ce_loss
        out = self.forward(params, batch, rng)
        pos = batch[self.POS_ITEM_ID]
        w = batch.get("_weight")
        if self.loss_type == "BPR":
            # reference quirk (hgn.py:175-180): positive scores use the
            # PREDICTION table, negatives the SEQUENCE table
            pos_e = params["item_out_embedding"][pos]
            neg_e = params["item_embedding"][batch[self.NEG_ITEM_ID]]
            loss = bpr_loss(jnp.sum(out * pos_e, -1),
                            jnp.sum(out * neg_e, -1), w)
        else:
            logits = jnp.dot(out, params["item_out_embedding"].T,
                             preferred_element_type=jnp.float32)
            loss = ce_loss(logits, pos, w)
        # parity: reference hgn.py:75-90 — reg_1 on the four gating weights'
        # Frobenius norms, reg_2 on the BATCH user / pos-item (prediction
        # table) / sequence-item representations; padded scan rows are
        # masked out via _weight
        reg1 = self.reg_weight[0] * (fro_norm(params["w1"])
                                     + fro_norm(params["w2"])
                                     + fro_norm(params["w3"])
                                     + fro_norm(params["w4"]))
        w = batch.get("_weight")
        u_e = params["user_embedding"][batch[self.USER_ID]]
        pos_e = params["item_out_embedding"][batch[self.POS_ITEM_ID]]
        seq_e = self.embed_seq(params, batch[self.ITEM_SEQ])
        if w is not None:
            u_e = u_e * w[:, None]
            pos_e = pos_e * w[:, None]
            seq_e = seq_e * w[:, None, None]
        reg2 = self.reg_weight[1] * (fro_norm(u_e) + fro_norm(pos_e)
                                     + fro_norm(seq_e))
        return loss + reg1 + reg2
