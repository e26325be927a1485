"""KSR: knowledge-enhanced sequential recommendation with a key-value memory.

Parity target: reference KSR (recbole/model/sequential_recommender/ksr.py) —
GRU over item embeddings for sequential preference; a per-relation key-value
memory over pretrained KG embeddings (tails approximated as head + relation,
ksr.py:90-97) updated by a sigmoid gate at each step and read by softmax
attention against the relation keys; item representation combines item and
entity embeddings. The per-step Python loop becomes a lax.scan that also
latches the memory at each sequence's last real position.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, gru_init, gru_apply, xavier_normal, \
    dropout_apply
from ...utils.enums import InputType
from ...utils.logger import get_logger
from .. import register_model


@register_model("KSR")
class KSR(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding", "entity_embedding")
    default_config = {"embedding_size": 64, "hidden_size": 128,
                      "num_layers": 1, "dropout_prob": 0.1,
                      "loss_type": "CE", "freeze_kg": False, "gamma": 10,
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.hidden_size = config["hidden_size"]
        self.num_layers = config["num_layers"]
        self.dropout_prob = config["dropout_prob"]
        self.loss_type = config["loss_type"]
        self.freeze_kg = config["freeze_kg"]
        self.gamma = config["gamma"]
        self.n_relations = dataset.relation_num - 1  # drop [UI-Relation]
        self.input_type = (InputType.PAIRWISE if self.loss_type == "BPR"
                           else InputType.POINTWISE)
        self.pre_ent, self.pre_rel = None, None
        for name, attr in (("ent_id", "pre_ent"), ("rel_id", "pre_rel")):
            try:
                w = dataset.get_preload_weight(name)
                if w.shape[1] != self.embedding_size:
                    raise ValueError(
                        f"preloaded {name} dim {w.shape[1]} != embedding_size")
                setattr(self, attr, jnp.asarray(w))
            except ValueError as e:
                if "dim" in str(e):
                    raise
                get_logger().warning(
                    "KSR: no preloaded %s weights; initializing randomly", name)

    def init_params(self, rng):
        ks = jax.random.split(rng, 7)
        D, H = self.embedding_size, self.hidden_size
        ent = (self.pre_ent[:self.n_items] if self.pre_ent is not None
               else embedding_init(ks[1], self.n_items, D))
        if ent.shape[0] < self.n_items:
            ent = jnp.concatenate(
                [ent, jnp.zeros((self.n_items - ent.shape[0], D))], axis=0)
        rel = (self.pre_rel[:self.n_relations] if self.pre_rel is not None
               else xavier_normal(ks[2], (self.n_relations, D)))
        if rel.shape[0] < self.n_relations:
            rel = jnp.concatenate(
                [rel, jnp.zeros((self.n_relations - rel.shape[0], D))], axis=0)
        return {
            "item_embedding": embedding_init(ks[0], self.n_items, D),
            "entity_embedding": ent,
            "relation_embedding": rel,
            "gru": gru_init(ks[3], D, H, self.num_layers),
            "dense_w": xavier_normal(ks[4], (H, D)), "dense_b": jnp.zeros((D,)),
            "dense_u_w": xavier_normal(ks[5], (2 * D, D)),
            "dense_u_b": jnp.zeros((D,)),
            "dense_i_w": xavier_normal(ks[6], (2 * D, D)),
            "dense_i_b": jnp.zeros((D,)),
        }

    def _tables(self, params):
        ent = params["entity_embedding"]
        if self.freeze_kg:
            ent = jax.lax.stop_gradient(ent)
        # the reference's relation_Matrix is a plain tensor, not a
        # Parameter — it NEVER trains, freeze_kg or not (ksr.py:79-81)
        rel = jax.lax.stop_gradient(params["relation_embedding"])
        return ent, rel

    def forward(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        B, L = seq.shape
        ent, rel = self._tables(params)

        x = self.embed_seq(params, seq)
        if rng is not None and self.dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, self.dropout_prob)
        h = gru_apply(params["gru"], x)
        h = jnp.dot(h, params["dense_w"],
                    preferred_element_type=jnp.float32) + params["dense_b"]
        seq_output = self.gather_last(h, seq_len)               # (B, D)

        # memory write: per step, tails = head + relations; gated update;
        # latch memory at the last real step of each row
        heads = ent[seq]                                        # (B, L, D)
        last_pos = jnp.clip(seq_len - 1, 0, L - 1)

        def write(carry, inp):
            memory, latched = carry
            t, head_t = inp
            update = head_t[:, None, :] + rel[None, :, :]       # (B, R, D)
            z = jax.nn.sigmoid(jnp.sum(memory * update, -1))[..., None]
            memory = (1.0 - z) * memory + z * update
            latch_now = (last_pos == t)[:, None, None]
            latched = jnp.where(latch_now, memory, latched)
            return (memory, latched), ()

        mem0 = jnp.zeros((B, self.n_relations, self.embedding_size))
        (_, latched), _ = jax.lax.scan(
            write, (mem0, mem0),
            (jnp.arange(L), heads.transpose(1, 0, 2)))

        # memory read: attention against relation keys
        att = jax.nn.softmax(
            self.gamma * jnp.sum(latched * rel[None, :, :], -1), axis=-1)
        u_m = jnp.sum(latched * att[..., None], axis=1)         # (B, D)
        return jnp.dot(jnp.concatenate([seq_output, u_m], -1),
                       params["dense_u_w"],
                       preferred_element_type=jnp.float32) + params["dense_u_b"]

    def _item_table_combined(self, params):
        ent, _ = self._tables(params)
        both = jnp.concatenate([params["item_embedding"], ent], axis=-1)
        return jnp.dot(both, params["dense_i_w"],
                       preferred_element_type=jnp.float32) + params["dense_i_b"]

    def calculate_loss(self, params, batch, rng=None):
        from ..losses import bpr_loss, ce_loss
        out = self.forward(params, batch, rng)
        pos = batch[self.POS_ITEM_ID]
        w = batch.get("_weight")
        table = self._item_table_combined(params)
        if self.loss_type == "BPR":
            neg = batch[self.NEG_ITEM_ID]
            return bpr_loss(jnp.sum(out * table[pos], -1),
                            jnp.sum(out * table[neg], -1), w)
        logits = jnp.dot(out, table.T, preferred_element_type=jnp.float32)
        return ce_loss(logits, pos, w)

    def predict(self, params, batch):
        out = self.forward(params, batch)
        table = self._item_table_combined(params)
        return jnp.sum(out * table[batch[self.ITEM_ID]], -1)

    def score_items(self, params, batch, items):
        out = self.forward(params, batch)
        table = self._item_table_combined(params)
        return jnp.einsum("bd,bcd->bc", out, table[items],
                          preferred_element_type=jnp.float32)

    def full_sort_predict(self, params, batch):
        out = self.forward(params, batch)
        return jnp.dot(out, self._item_table_combined(params).T,
                       preferred_element_type=jnp.float32)
