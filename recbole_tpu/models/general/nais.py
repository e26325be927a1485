"""NAIS: neural attentive item similarity.

Parity target: reference NAIS (recbole/model/general_recommender/nais.py) —
FISM with an attention network over history items ('prod' or 'concat'
variants), smoothed softmax with exponent beta.
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import normal_init, xavier_uniform
from ..losses import bce_loss, fro_norm as _fro
from ...utils.enums import InputType
from .. import register_model


@register_model("NAIS")
class NAIS(GeneralRecommender):
    # torch pins Embedding(padding_idx=0) rows; the trainer zeroes these
    # tables' row-0 grads to match
    pad_zero_params = ("item_src_embedding", "item_dst_embedding")
    input_type = InputType.POINTWISE
    default_config = {"algorithm": "prod", "embedding_size": 64,
                      "weight_size": 64, "split_to": 0,
                      "reg_weights": [1e-7, 1e-7, 1e-5], "alpha": 0,
                      "beta": 0.5, "pretrain_path": None}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_size = config["embedding_size"]
        self.weight_size = config["weight_size"]
        self.algorithm = config["algorithm"]
        self.reg_weights = config["reg_weights"]
        self.beta = config["beta"]
        if self.algorithm not in ("prod", "concat"):
            raise ValueError("algorithm must be 'prod' or 'concat'")
        hist, hlen = dataset.history_item_matrix()
        self.max_hist = int(hist.shape[1])
        self.hist = self.register_const("hist", hist)
        self.hlen = self.register_const("hlen", hlen)

    def init_params(self, rng):
        ks = jax.random.split(rng, 4)
        D, W = self.embedding_size, self.weight_size
        in_dim = D if self.algorithm == "prod" else 2 * D
        return {
            "item_src_embedding": normal_init(ks[0], (self.n_items, D)),
            "item_dst_embedding": normal_init(ks[1], (self.n_items, D)),
            "item_bias": jnp.zeros(self.n_items),
            "attn_w": xavier_uniform(ks[2], (in_dim, W)),
            "attn_b": jnp.zeros(W),
            "attn_h": xavier_uniform(ks[3], (W,)),
        }

    def _attn_scores(self, params, hist_emb, target_emb, valid):
        """hist_emb: (B, H, D); target_emb: (B, D) -> masked exp-logits
        (B, H). The beta-smoothed denominator is applied by the caller after
        summing over all history chunks (the reference applies no max-
        subtraction either, nais.py softmax)."""
        if self.algorithm == "prod":
            x = hist_emb * target_emb[:, None, :]
        else:
            x = jnp.concatenate(
                [hist_emb, jnp.broadcast_to(target_emb[:, None, :],
                                            hist_emb.shape)], -1)
        a = jax.nn.relu(jnp.einsum("bhd,dw->bhw", x, params["attn_w"],
                                   preferred_element_type=jnp.float32)
                        + params["attn_b"])
        logits = jnp.einsum("bhw,w->bh", a, params["attn_h"],
                            preferred_element_type=jnp.float32)
        return jnp.exp(logits) * valid

    # history-axis chunk width: bounds the (B, chunk, D) live set so long-tail
    # users (ml-1m max history 2314) never materialize (B, H_max, D) at once
    HIST_CHUNK = 256

    def _logits(self, params, user, item):
        """score = (sum_h e_h * sim_h) / (sum_h e_h)^beta — decomposable over
        history, so the history axis is scanned in fixed chunks (the
        reference materializes the full (B, H_max, D) gather, nais.py,
        which needs 21.8GB at ml-1m scale)."""
        h = self.hist[user]                                # (B, Hmax)
        B, Hm = h.shape
        q = params["item_dst_embedding"][item]             # (B, D)
        hc = min(self.HIST_CHUNK, Hm)
        n_chunks = -(-Hm // hc)
        pad = n_chunks * hc - Hm
        h = jnp.pad(h, ((0, 0), (0, pad)))
        pos = jnp.arange(n_chunks * hc)
        hlen = self.hlen[user][:, None]

        def chunk(carry, c):
            sum_e, sum_es = carry
            hck = jax.lax.dynamic_slice(h, (0, c * hc), (B, hc))
            pck = jax.lax.dynamic_slice(pos, (c * hc,), (hc,))
            valid = ((pck[None, :] < hlen)
                     & (hck != item[:, None])).astype(jnp.float32)
            hist_emb = params["item_src_embedding"][hck]   # (B, hc, D)
            e = self._attn_scores(params, hist_emb, q, valid)
            sim = jnp.einsum("bhd,bd->bh", hist_emb, q,
                             preferred_element_type=jnp.float32)
            return (sum_e + jnp.sum(e, -1),
                    sum_es + jnp.sum(e * sim, -1)), None

        (sum_e, sum_es), _ = jax.lax.scan(
            chunk, (jnp.zeros(B), jnp.zeros(B)), jnp.arange(n_chunks))
        denom = jnp.power(jnp.maximum(sum_e, 1e-12), self.beta)
        return sum_es / denom + params["item_bias"][item]

    def calculate_loss(self, params, batch, rng=None):
        logits = self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID])
        loss = bce_loss(logits, batch[self.LABEL], batch.get("_weight"))
        # Frobenius NORMS of the full tables + the attention-MLP weight
        # (parity: reference reg_loss uses weight.norm(2), nais.py:138-152)
        reg = (self.reg_weights[0] * _fro(params["item_src_embedding"])
               + self.reg_weights[1] * _fro(params["item_dst_embedding"])
               + self.reg_weights[2] * _fro(params["attn_w"]))
        return loss + reg

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID]))

    # user sub-block / history chunk for the full-sort tile: the live
    # attention tensor is (UB, FS_HC, weight_size, n_items)
    FS_UB = 8
    FS_HC = 32

    def full_sort_predict(self, params, batch):
        """All-item scores. The attention MLP couples every (history item,
        target item) pair, so full sort is intrinsically sum_u H_u * N * D*W
        FLOPs — the reference brute-forces the padded cube (21.8GB on ml-1m,
        OOM beyond). Here: user sub-blocks x history chunks, with the MLP
        contraction reshaped into one wide (UB*HC*W, D) @ (D, N) MXU matmul
        and a while_loop bound by each sub-block's real max history length,
        so padded history rows cost nothing."""
        user = batch[self.USER_ID]
        B = user.shape[0]
        N, D, W = self.n_items, self.embedding_size, self.weight_size
        ub, hc = self.FS_UB, self.FS_HC
        q_all = params["item_dst_embedding"]                  # (N, D)
        wm, bw, v = params["attn_w"], params["attn_b"], params["attn_h"]
        n_hc = -(-self.max_hist // hc)
        n_ub = -(-B // ub)
        users = jnp.pad(user, (0, n_ub * ub - B))
        item_ids = jnp.arange(N, dtype=jnp.int32)
        if self.algorithm == "concat":
            w1, w2 = wm[:D], wm[D:]
            qw = jnp.dot(q_all, w2, preferred_element_type=jnp.float32)

        def user_block(ublk):                                 # (ub,) users
            h = jnp.pad(self.hist[ublk],
                        ((0, 0), (0, n_hc * hc - self.max_hist)))
            hl = self.hlen[ublk]
            max_len = jnp.max(hl)

            def cond(c):
                return c[0] * hc < max_len

            def body(c):
                ci, sum_e, sum_es = c
                hck = jax.lax.dynamic_slice(h, (0, ci * hc), (ub, hc))
                pos = ci * hc + jnp.arange(hc)
                valid = (pos[None, :] < hl[:, None]).astype(jnp.float32)
                p = params["item_src_embedding"][hck]         # (ub, hc, D)
                if self.algorithm == "prod":
                    # a_{u,h,w,n} = sum_d p_{uhd} W_{dw} q_{nd}
                    pm = (p[:, :, :, None] * wm[None, None]) \
                        .transpose(0, 1, 3, 2).reshape(ub * hc * W, D)
                    a = jnp.dot(pm, q_all.T,
                                preferred_element_type=jnp.float32) \
                        .reshape(ub, hc, W, N) + bw[None, None, :, None]
                else:                                         # concat: separable
                    pw = jnp.dot(p.reshape(ub * hc, D), w1,
                                 preferred_element_type=jnp.float32) \
                        .reshape(ub, hc, W)
                    a = (pw[:, :, :, None] + qw.T[None, None]
                         + bw[None, None, :, None])
                logits = jnp.einsum("uhwn,w->uhn", jax.nn.relu(a), v,
                                    preferred_element_type=jnp.float32)
                e = jnp.exp(logits) * valid[:, :, None]
                # exclude the target from its own history (parity: _logits)
                e = e * (hck[:, :, None] != item_ids[None, None, :])
                sim = jnp.dot(p.reshape(ub * hc, D), q_all.T,
                              preferred_element_type=jnp.float32) \
                    .reshape(ub, hc, N)
                return (ci + 1, sum_e + jnp.sum(e, 1),
                        sum_es + jnp.sum(e * sim, 1))

            _, sum_e, sum_es = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.zeros((ub, N)),
                             jnp.zeros((ub, N))))
            denom = jnp.power(jnp.maximum(sum_e, 1e-12), self.beta)
            return sum_es / denom + params["item_bias"][None, :]

        out = jax.lax.map(user_block, users.reshape(n_ub, ub))
        return out.reshape(-1, N)[:B]
