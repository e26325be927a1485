"""BERT4Rec: bidirectional transformer with cloze training.

Parity target: reference BERT4Rec
(recbole/model/sequential_recommender/bert4rec.py) — items + a [MASK] token
(id = n_items); training randomly masks positions and predicts the masked
items with a bidirectional encoder; inference appends [MASK] after the
sequence and reads that position.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import (normal_init, transformer_init, transformer_apply,
                      bidirectional_attention_mask, layer_norm, dropout_apply)
from ..losses import ce_loss
from ...utils.enums import InputType
from .. import register_model


@register_model("BERT4Rec")
class BERT4Rec(SequentialRecommender):
    input_type = InputType.POINTWISE
    default_config = {"n_layers": 2, "n_heads": 2, "hidden_size": 64,
                      "inner_size": 256, "hidden_dropout_prob": 0.5,
                      "attn_dropout_prob": 0.5, "hidden_act": "gelu",
                      "layer_norm_eps": 1e-12, "initializer_range": 0.02,
                      "mask_ratio": 0.2, "loss_type": "CE",
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.n_layers = config["n_layers"]
        self.n_heads = config["n_heads"]
        self.hidden_size = config["hidden_size"]
        self.inner_size = config["inner_size"]
        self.hidden_dropout_prob = config["hidden_dropout_prob"]
        self.attn_dropout_prob = config["attn_dropout_prob"]
        self.hidden_act = config["hidden_act"]
        self.initializer_range = config["initializer_range"]
        self.mask_ratio = config["mask_ratio"]
        self.loss_type = config["loss_type"]
        self.mask_token = self.n_items  # one extra id
        # sequences enter with length max_seq_length; we reserve one slot for
        # the appended eval-time mask
        self.L = self.max_seq_length + 1

    def init_params(self, rng):
        ki, kp, kt = jax.random.split(rng, 3)
        std = self.initializer_range
        emb = normal_init(ki, (self.n_items + 1, self.hidden_size), std)
        return {
            "item_embedding": emb.at[0].set(0.0),
            "position_embedding": normal_init(kp, (self.L, self.hidden_size),
                                              std),
            "encoder": transformer_init(kt, self.n_layers, self.n_heads,
                                        self.hidden_size, self.inner_size),
            "ln_g": jnp.ones(self.hidden_size),
            "ln_b": jnp.zeros(self.hidden_size),
        }

    def _encode(self, params, seq, rng=None):
        valid = seq != 0
        L = seq.shape[1]
        x = self.embed_seq(params, seq) \
            + params["position_embedding"][None, :L, :]
        x = layer_norm(x, params["ln_g"], params["ln_b"])
        if rng is not None and self.hidden_dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, self.hidden_dropout_prob)
        # key-side masking only: padded-query rows are garbage either way and
        # the loss/readout never touches them, so this matches the dense
        # bidirectional mask where it matters (and enables the fused kernel)
        return transformer_apply(
            params["encoder"], x, None, self.n_heads, act=self.hidden_act,
            dropout=self.hidden_dropout_prob if rng is not None else 0.0,
            attn_dropout=self.attn_dropout_prob if rng is not None else 0.0,
            rng=rng, mask_spec=(valid.astype(jnp.int32), False),
            fused=self.config["fused_attention"])

    def calculate_loss(self, params, batch, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq = jnp.pad(seq, ((0, 0), (0, 1)))                   # room for [MASK]
        B, L = seq.shape
        rng = rng if rng is not None else jax.random.key(0)
        rng, km, ke = jax.random.split(rng, 3)
        is_item = seq != 0
        do_mask = (jax.random.uniform(km, seq.shape) < self.mask_ratio) & is_item
        masked_seq = jnp.where(do_mask, self.mask_token, seq)
        h = self._encode(params, masked_seq, ke)               # (B, L, D)
        # Score ONLY the masked positions, gathered into a fixed-capacity
        # (B, M) buffer — masked count is Binomial(L, ratio), so M at
        # mean + 6 sigma overflows with probability ~1e-9 per row (excess
        # positions in such a row are dropped). The dense alternative
        # materializes (B, L, n_items) logits + log-softmax (~6GB of HBM
        # traffic per step at ml-1m shape) for the ~20% of positions that
        # contribute. CE itself is the fused logsumexp - target-logit form.
        # Position 0 can never contribute: the reference stores masked
        # indices in a 0-padded buffer, so a masked FIRST position is
        # indistinguishable from padding and is dropped (bert4rec.py:229-232).
        import math
        mean = L * self.mask_ratio
        sigma = math.sqrt(L * self.mask_ratio * (1 - self.mask_ratio))
        M = min(L, int(math.ceil(mean + 6 * sigma)))
        flags = do_mask & (jnp.arange(L)[None, :] > 0)
        # top-M masked positions per row (earlier positions preferred; order
        # is irrelevant to the sum)
        rank = jnp.where(flags, L - jnp.arange(L)[None, :], 0)
        vals, pos = jax.lax.top_k(rank, M)                     # (B, M)
        sel = (vals > 0)
        h_sel = jnp.take_along_axis(h, pos[:, :, None], 1)     # (B, M, D)
        tgt = jnp.take_along_axis(seq, pos, 1)                 # (B, M)
        table = params["item_embedding"][:self.n_items]
        if self.cdt is not None:
            h_sel = h_sel.astype(self.cdt)
            table = table.astype(self.cdt)
        logits = jnp.einsum("bmd,nd->bmn", h_sel, table,
                            preferred_element_type=jnp.float32)
        lse = jax.nn.logsumexp(logits, -1)                     # (B, M)
        pos_logit = jnp.take_along_axis(
            logits, jnp.where(sel, tgt, 0)[:, :, None], -1)[:, :, 0]
        nll = lse - pos_logit
        w = sel.astype(jnp.float32)
        if "_weight" in batch:
            w = w * batch["_weight"][:, None]
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    def forward(self, params, batch, rng=None):
        """Append [MASK] after the sequence; read its position."""
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        seq = jnp.pad(seq, ((0, 0), (0, 1)))
        B, L = seq.shape
        pos = jnp.clip(seq_len, 0, L - 1)
        seq = seq.at[jnp.arange(B), pos].set(self.mask_token)
        h = self._encode(params, seq)
        return jnp.take_along_axis(h, pos[:, None, None], 1)[:, 0]

    def _item_table(self, params):
        return params["item_embedding"][:self.n_items]
