"""RepeatNet: repeat-aware recommendation with repeat/explore decoders.

Parity target: reference RepeatNet
(recbole/model/sequential_recommender/repeatnet.py) — GRU memory; a
repeat-vs-explore gate from attention over the memory; a repeat decoder that
softmaxes attention over history POSITIONS and scatters the mass onto the item
vocabulary; an explore decoder that softmaxes a vocab-sized projection with
history items masked to -inf; final distribution is the gated mixture and the
loss is NLL on it (the reference's build_map one-hot matmul,
repeatnet.py:294-320, becomes a scatter-add).
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import embedding_init, gru_init, gru_apply, xavier_uniform
from ...utils.enums import InputType
from .. import register_model


@register_model("RepeatNet")
class RepeatNet(SequentialRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_embedding",)
    input_type = InputType.POINTWISE
    default_config = {"embedding_size": 64, "hidden_size": 64,
                      "joint_train": False, "dropout_prob": 0.5,
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.hidden_size = config["hidden_size"]
        self.joint_train = config["joint_train"]

    def init_params(self, rng):
        ks = jax.random.split(rng, 12)
        D, H, N = self.embedding_size, self.hidden_size, self.n_items
        return {
            "item_embedding": embedding_init(ks[0], N, D),
            "gru": gru_init(ks[1], D, H),
            # repeat/explore gate
            "w_re": xavier_uniform(ks[2], (H, H)),
            "u_re": xavier_uniform(ks[3], (H, H)),
            "v_re": xavier_uniform(ks[4], (H, 1)),
            "w_cre": xavier_uniform(ks[5], (H, 2)),
            # repeat decoder
            "w_r": xavier_uniform(ks[6], (H, H)),
            "u_r": xavier_uniform(ks[7], (H, H)),
            "v_r": xavier_uniform(ks[8], (H, 1)), "v_r_b": jnp.zeros((1,)),
            # explore decoder
            "w_e": xavier_uniform(ks[9], (H, H)), "w_e_b": jnp.zeros((H,)),
            "u_e": xavier_uniform(ks[10], (H, H)), "u_e_b": jnp.zeros((H,)),
            "v_e": xavier_uniform(ks[11], (H, 1)), "v_e_b": jnp.zeros((1,)),
            "explore_proj": xavier_uniform(
                jax.random.fold_in(ks[11], 1), (2 * H, N)),
        }

    def _distribution(self, params, batch):
        """(B, n_items) probability distribution + (B, 2) gate."""
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        B, L = seq.shape
        x = self.embed_seq(params, seq)
        mem = gru_apply(params["gru"], x)                       # (B, L, H)
        last = self.gather_last(mem, seq_len)                   # (B, H)
        pad = seq == 0                                          # (B, L)

        def attend(u, w, v, vb=None):
            e = jnp.tanh(jnp.dot(mem, u) + jnp.dot(last, w)[:, None, :])
            sc = jnp.dot(e, v)[:, :, 0]
            if vb is not None:
                sc = sc + vb
            sc = jnp.where(pad, -1e9, sc)
            return jax.nn.softmax(sc, axis=1)                   # (B, L)

        # gate (no pad mask in the reference's Repeat_Explore_Mechanism)
        e_g = jnp.tanh(jnp.dot(mem, params["u_re"])
                       + jnp.dot(last, params["w_re"])[:, None, :])
        a_g = jax.nn.softmax(jnp.dot(e_g, params["v_re"])[:, :, 0], axis=1)
        ctx_g = jnp.sum(a_g[:, :, None] * mem, axis=1)
        gate = jax.nn.softmax(jnp.dot(ctx_g, params["w_cre"]), axis=-1)  # (B,2)

        # repeat decoder: positional softmax scattered onto vocab
        a_r = attend(params["u_r"], params["w_r"], params["v_r"],
                     params["v_r_b"])
        rows = jnp.arange(B)[:, None]
        p_repeat = jnp.zeros((B, self.n_items)) \
            .at[rows, seq].add(jnp.where(pad, 0.0, a_r))

        # explore decoder: vocab softmax with history masked out
        a_e = attend(params["u_e"], params["w_e"], params["v_e"],
                     params["v_e_b"])
        ctx_e = jnp.sum(a_e[:, :, None] * mem, axis=1)
        logits_e = jnp.dot(jnp.concatenate([ctx_e, last], axis=-1),
                           params["explore_proj"],
                           preferred_element_type=jnp.float32)
        in_hist = jnp.zeros((B, self.n_items), jnp.bool_) \
            .at[rows, seq].max(~pad)
        logits_e = jnp.where(in_hist, -jnp.inf, logits_e)
        p_explore = jax.nn.softmax(logits_e, axis=-1)

        prob = p_repeat * gate[:, 0:1] + p_explore * gate[:, 1:2]
        return prob, gate

    def calculate_loss(self, params, batch, rng=None):
        prob, gate = self._distribution(params, batch)
        pos = batch[self.POS_ITEM_ID]
        w = batch.get("_weight")
        nll = -jnp.log(jnp.take_along_axis(prob, pos[:, None], 1)[:, 0] + 1e-8)
        keep = (pos != 0).astype(jnp.float32)
        weight = keep if w is None else keep * w
        loss = jnp.sum(nll * weight) / jnp.maximum(jnp.sum(weight), 1.0)
        if self.joint_train:
            # supervise the gate: target "repeat" when pos item is in history
            seq = batch[self.ITEM_SEQ]
            is_repeat = jnp.any((seq == pos[:, None]) & (seq != 0), axis=1)
            g_nll = -jnp.where(is_repeat,
                               jnp.log(gate[:, 0] + 1e-8),
                               jnp.log(gate[:, 1] + 1e-8))
            loss = loss + jnp.sum(g_nll * weight) / jnp.maximum(jnp.sum(weight), 1.0)
        return loss

    def full_sort_predict(self, params, batch):
        prob, _ = self._distribution(params, batch)
        return prob

    def predict(self, params, batch):
        prob, _ = self._distribution(params, batch)
        return jnp.take_along_axis(prob, batch[self.ITEM_ID][:, None], 1)[:, 0]

    def score_items(self, params, batch, items):
        prob, _ = self._distribution(params, batch)
        return jnp.take_along_axis(prob, items, axis=1)
