"""DIN: deep interest network (target-attention CTR over behavior sequences).

Parity target: reference DIN (recbole/model/sequential_recommender/din.py) —
item+feature embeddings of the history and the target, SequenceAttLayer
(query/key/diff/product MLP attention, layers.py:251-309), Dice-activated DNN,
sigmoid CTR output with BCE loss. Pointwise input; no full-sort matmul exists
(the trainer's chunked score_items fallback covers ranking protocols).
"""

import jax
import jax.numpy as jnp

from ..base import SequentialRecommender
from ..layers import mlp_init, mlp_apply, xavier_normal
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model
from .feat_embed import ItemFeatEmbedder


def dice(x):
    """Dice activation AS IMPLEMENTED by the reference (layers.py:228-248):
    its alpha is a plain zeros tensor — not a Parameter, never trains — and
    no standardization happens despite the docstring math, so
    f(x) = sigmoid(x)·x (swish, exactly)."""
    return jax.nn.sigmoid(x) * x


def att_mlp_init(rng, dims):
    return mlp_init(rng, dims)


def sequence_attention(params, query, keys, keys_len, softmax_stag=False):
    """parity: SequenceAttLayer (layers.py:251) with return_seq_weight=False.

    query: (B, H); keys: (B, L, H); -> (B, H) attended history.
    """
    B, L, H = keys.shape
    q = jnp.broadcast_to(query[:, None, :], (B, L, H))
    x = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)
    for layer in params["mlp"]:
        x = jax.nn.sigmoid(jnp.dot(x, layer["w"],
                                   preferred_element_type=jnp.float32)
                           + layer["b"])
    score = jnp.dot(x, params["dense_w"])[:, :, 0] + params["dense_b"]  # (B, L)
    invalid = jnp.arange(L)[None, :] >= keys_len[:, None]
    # -1e9 (not -inf): rows that are ALL padding (weight-0 batch fill) must
    # softmax to uniform, not NaN
    score = jnp.where(invalid, -1e9 if softmax_stag else 0.0, score)
    score = score / (H ** 0.5)
    if softmax_stag:
        score = jax.nn.softmax(score, axis=1)
    return jnp.einsum("bl,blh->bh", score, keys,
                      preferred_element_type=jnp.float32), score


@register_model("DIN")
class DIN(SequentialRecommender):
    input_type = InputType.POINTWISE
    full_sort_fallback = True
    default_config = {"embedding_size": 10, "mlp_hidden_size": [256, 256, 256],
                      "dropout_prob": 0.0, "pooling_mode": "mean",
                      "training_neg_sample_num": 1, "selected_features": None}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.LABEL = config["LABEL_FIELD"]
        self.embedding_size = config["embedding_size"]
        self.mlp_hidden_size = list(config["mlp_hidden_size"])
        self.dropout_prob = config["dropout_prob"]
        self.embedder = ItemFeatEmbedder(
            dataset, config["selected_features"], config["pooling_mode"])
        self.feat_dim = self.embedder.num_fields * self.embedding_size

    def init_params(self, rng):
        ks = jax.random.split(rng, 5)
        H = self.feat_dim
        att_dims = [4 * H] + self.mlp_hidden_size
        dnn_dims = [3 * H] + self.mlp_hidden_size
        # frozen N(0,1) feature tables (reference keeps them out of the
        # optimizer/state_dict — see ItemFeatEmbedder.init)
        params = {"_const": self.embedder.init(ks[0], self.embedding_size)}
        params["att"] = {
            "mlp": mlp_init(ks[1], att_dims),
            "dense_w": xavier_normal(ks[2], (att_dims[-1], 1)),
            "dense_b": jnp.zeros(()),
        }
        # bn=True: the reference's dnn_mlp_layers carry BatchNorm1d
        # (din.py:71); our bn uses batch statistics (padded-row aware)
        params["dnn"] = mlp_init(ks[3], dnn_dims, bn=True)
        params["predict_w"] = xavier_normal(ks[4], (self.mlp_hidden_size[-1], 1))
        params["predict_b"] = jnp.zeros(())
        return params

    def _logits(self, params, batch, target_items, rng=None):
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        keys = self.embedder.embed_flat(params, seq)               # (B, L, H)
        target = self.embedder.embed_flat(params, target_items)   # (B, H)
        user_emb, _ = sequence_attention(params["att"], target, keys, seq_len)
        x = jnp.concatenate([user_emb, target, user_emb * target], axis=-1)
        # dropout → linear → batchnorm → dice (reference MLPLayers order)
        x = mlp_apply(params["dnn"], x, act=dice,
                      dropout=self.dropout_prob if rng is not None else 0.0,
                      rng=rng, bn_w=batch.get("_weight"))
        return jnp.dot(x, params["predict_w"])[:, 0] + params["predict_b"]

    def calculate_loss(self, params, batch, rng=None):
        logits = self._logits(params, batch, batch[self.POS_ITEM_ID],
                              rng=rng)
        return bce_loss(logits, batch[self.LABEL].astype(jnp.float32),
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(self._logits(params, batch, batch[self.ITEM_ID]))

    # every (seq, candidate) pair drags the full history through the
    # attention + Dice MLP — bound the pairs alive at once so catalog-scale
    # eval doesn't materialize (B * n_items, L, H) (the 512MB-score-matrix
    # eval batch sizing assumes cheap per-pair scoring)
    score_pair_block = 8192

    def score_items(self, params, batch, items):
        B, C = items.shape
        seq = batch[self.ITEM_SEQ]
        seq_len = batch[self.ITEM_SEQ_LEN]
        rows = jnp.repeat(jnp.arange(B), C)
        flat_i = items.reshape(-1)
        P = B * C
        pb = int(self.score_pair_block)
        n_pb = -(-P // pb)
        rows = jnp.pad(rows, (0, n_pb * pb - P))
        flat_i = jnp.pad(flat_i, (0, n_pb * pb - P))

        def block(uv):
            r, it = uv
            sub = {self.ITEM_SEQ: seq[r], self.ITEM_SEQ_LEN: seq_len[r]}
            return self._logits(params, sub, it)

        out = jax.lax.map(block, (rows.reshape(n_pb, pb),
                                  flat_i.reshape(n_pb, pb)))
        return out.reshape(-1)[:P].reshape(B, C)
