"""DIEN: deep interest evolution network.

Parity target: reference DIEN (recbole/model/sequential_recommender/dien.py) —
interest extractor GRU with an auxiliary click/no-click discriminator over a
POSITION-WISE negative item sequence, AUGRU interest evolution gated by target
attention, Dice DNN with sigmoid CTR output.

TPU re-design: the negative item sequence (reference: SeqSampler host loop,
sampler.py:450-468 via DIENDataLoader, dien_dataloader.py:52-56) is sampled ON
DEVICE inside calculate_loss — per position, uniform over [1, n_items) with a
fixed number of resample rounds to avoid colliding with the clicked item.
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import mlp_init, mlp_apply, xavier_normal, gru_init, \
    gru_apply
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model
from .feat_embed import ItemFeatEmbedder
from .din import dice, sequence_attention


def augru_apply(p, x, att, h0=None):
    """AUGRU: GRU whose update gate is scaled by the attention score
    (parity: AUGRUCell, dien.py:350-392). x: (B, L, D), att: (B, L)."""
    B, L, _ = x.shape
    H = p["wh"].shape[0]
    h_init = jnp.zeros((B, H), x.dtype) if h0 is None else h0
    xi = jnp.dot(x, p["wi"], preferred_element_type=jnp.float32) + p["bi"]

    def step(h, inp):
        xi_t, a_t = inp
        hh = jnp.dot(h, p["wh"], preferred_element_type=jnp.float32) + p["bh"]
        ir, iz, in_ = jnp.split(xi_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hh, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz) * a_t[:, None]
        n = jnp.tanh(in_ + r * hn)
        h_new = (1 - z) * h + z * n
        return h_new, h_new

    _, outs = jax.lax.scan(step, h_init,
                           (xi.transpose(1, 0, 2), att.T))
    return outs.transpose(1, 0, 2)


@register_model("DIEN")
class DIEN(SequentialRecommender):
    input_type = InputType.POINTWISE
    full_sort_fallback = True
    default_config = {"embedding_size": 10, "mlp_hidden_size": [256, 256, 256],
                      "dropout_prob": 0.0, "pooling_mode": "mean",
                      "gru_type": "AUGRU", "alpha": 1.0,
                      "training_neg_sample_num": 1, "selected_features": None,
                      "neg_seq_resample_rounds": 4}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.LABEL = config["LABEL_FIELD"]
        self.embedding_size = config["embedding_size"]
        self.mlp_hidden_size = list(config["mlp_hidden_size"])
        self.alpha = config["alpha"]
        self.dropout_prob = config["dropout_prob"]
        self.resample_rounds = config["neg_seq_resample_rounds"]
        self.NEG_ITEM_SEQ = (config["NEG_PREFIX"] or "neg_") + self.ITEM_SEQ
        self.embedder = ItemFeatEmbedder(
            dataset, config["selected_features"], config["pooling_mode"])
        # user feature stream feeds the final DNN (reference dien.py:127:
        # dien_in = [evolution, target, user_feat_list])
        self.user_embedder = ItemFeatEmbedder(
            dataset, None, config["pooling_mode"], side="user")
        self.feat_dim = self.embedder.num_fields * self.embedding_size
        self.user_dim = self.user_embedder.num_fields * self.embedding_size

    def init_params(self, rng):
        ks = jax.random.split(rng, 8)
        H = self.feat_dim
        att_dims = [4 * H] + self.mlp_hidden_size
        dnn_dims = [2 * H + self.user_dim] + self.mlp_hidden_size
        # frozen N(0,1) feature tables (reference keeps them out of the
        # optimizer/state_dict — see ItemFeatEmbedder.init)
        params = {"_const": {
            **self.embedder.init(ks[0], self.embedding_size),
            **self.user_embedder.init(jax.random.fold_in(ks[0], 1),
                                      self.embedding_size),
        }}
        params["extractor_gru"] = gru_init(ks[1], H, H)[0]
        # [2H] + mlp_hidden_size + [1], all-sigmoid (interest_mlp_list,
        # dien.py:68 + MLPLayers activation after EVERY linear)
        params["aux_mlp"] = mlp_init(
            ks[2], [2 * H] + self.mlp_hidden_size + [1])
        params["att"] = {
            "mlp": mlp_init(ks[3], att_dims),
            "dense_w": xavier_normal(ks[4], (att_dims[-1], 1)),
            "dense_b": jnp.zeros(()),
        }
        params["augru"] = gru_init(ks[5], H, H)[0]
        # bn=True Dice DNN (dien.py:77)
        params["dnn"] = mlp_init(ks[6], dnn_dims, bn=True)
        params["predict_w"] = xavier_normal(ks[7],
                                            (self.mlp_hidden_size[-1], 1))
        params["predict_b"] = jnp.zeros(())
        return params

    def _interest(self, params, keys, seq_len):
        """Extractor GRU states (B, L, H), ZEROED at padded positions (the
        reference runs a packed GRU and re-pads with 0, dien.py:168-174)."""
        L = keys.shape[1]
        valid = (jnp.arange(L)[None, :] < seq_len[:, None])
        return gru_apply([params["extractor_gru"]], keys) \
            * valid[..., None].astype(keys.dtype)

    def _aux_prob(self, params, h, e):
        x = jnp.concatenate([h, e], axis=-1)
        for layer in params["aux_mlp"][:-1]:
            x = jax.nn.sigmoid(jnp.dot(x, layer["w"]) + layer["b"])
        last = params["aux_mlp"][-1]
        return jax.nn.sigmoid(jnp.dot(x, last["w"]) + last["b"])[..., 0]

    def _logits(self, params, batch, target_items, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        keys = self.embedder.embed_flat(params, seq)
        target = self.embedder.embed_flat(params, target_items)
        user_emb = self.user_embedder.embed_flat(params,
                                                 batch[self.USER_ID])
        interest = self._interest(params, keys, seq_len)
        # NO softmax on the attention scores (InterestEvolvingLayer keeps
        # SequenceAttLayer's softmax_stag=False default, dien.py:243-252)
        _, att = sequence_attention(params["att"], target, interest, seq_len,
                                    softmax_stag=False)
        evo = augru_apply(params["augru"], interest, att)
        evolution = self.gather_last(evo, seq_len)
        x = jnp.concatenate([evolution, target, user_emb], axis=-1)
        # dropout -> linear -> batchnorm -> dice (reference MLPLayers order)
        x = mlp_apply(params["dnn"], x, act=dice,
                      dropout=self.dropout_prob if rng is not None else 0.0,
                      rng=rng, bn_w=batch.get("_weight"))
        return jnp.dot(x, params["predict_w"])[:, 0] + params["predict_b"], \
            keys, interest, seq, seq_len

    def calculate_loss(self, params, batch, rng=None):
        logits, keys, interest, seq, seq_len = self._logits(
            params, batch, batch[self.POS_ITEM_ID], rng=rng)
        main = bce_loss(logits, batch[self.LABEL].astype(jnp.float32),
                        batch.get("_weight"))
        # auxiliary negatives: the loader-provided position-wise sequence
        # when present (reference DIENDataLoader/SeqSampler), else sampled
        # on device
        neg_seq = batch.get(self.NEG_ITEM_SEQ)
        if neg_seq is None:
            if rng is None:
                rng = jax.random.key(0)
            neg_seq = jax.random.randint(rng, seq.shape, 1, self.n_items,
                                         dtype=seq.dtype)
            for r in range(self.resample_rounds):
                clash = neg_seq == seq
                redraw = jax.random.randint(jax.random.fold_in(rng, r + 1),
                                            seq.shape, 1, self.n_items,
                                            dtype=seq.dtype)
                neg_seq = jnp.where(clash, redraw, neg_seq)
        neg_keys = self.embedder.embed_flat(params, neg_seq)
        h = interest[:, :-1, :]
        p_click = self._aux_prob(params, h, keys[:, 1:, :])
        p_noclick = self._aux_prob(params, h, neg_keys[:, 1:, :])
        # BCE over ALL (B, L-1) positions, padded ones included — the
        # reference passes keys_length-1 to auxiliary_loss and never uses
        # it (dien.py:177-214); torch BCE clamps log at -100
        per = -(jnp.maximum(jnp.log(p_click), -100.0)
                + jnp.maximum(jnp.log(1.0 - p_noclick), -100.0))  # (B, L-1)
        w = batch.get("_weight")
        if w is None:
            aux = jnp.mean(per) / 2.0
        else:  # exclude padded scan fill ROWS (no reference counterpart)
            aux = jnp.sum(per * w[:, None]) / (
                2.0 * per.shape[1] * jnp.maximum(jnp.sum(w), 1.0))
        return main, self.alpha * aux

    def predict(self, params, batch):
        logits, *_ = self._logits(params, batch, batch[self.ITEM_ID])
        return jax.nn.sigmoid(logits)

    # per-pair GRU+AUGRU over the full history: bound pairs alive at once
    # (see DIN.score_items)
    score_pair_block = 4096

    def score_items(self, params, batch, items):
        B, C = items.shape
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        user = batch[self.USER_ID]
        rows = jnp.repeat(jnp.arange(B), C)
        flat_i = items.reshape(-1)
        P = B * C
        pb = int(self.score_pair_block)
        n_pb = -(-P // pb)
        rows = jnp.pad(rows, (0, n_pb * pb - P))
        flat_i = jnp.pad(flat_i, (0, n_pb * pb - P))

        def block(uv):
            r, it = uv
            sub = {self.ITEM_SEQ: seq[r], self.ITEM_SEQ_LEN: seq_len[r],
                   self.USER_ID: user[r]}
            return self._logits(params, sub, it)[0]

        out = jax.lax.map(block, (rows.reshape(n_pb, pb),
                                  flat_i.reshape(n_pb, pb)))
        return out.reshape(-1)[:P].reshape(B, C)
