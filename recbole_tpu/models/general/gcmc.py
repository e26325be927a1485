"""GCMC: graph convolutional matrix completion.

Parity target: reference GCMC (recbole/model/general_recommender/gcmc.py) —
one-hot node features through shared factor weights (with identity features
this is just selecting weight rows; share_user_item_weights=True makes the
user/item weight lists the SAME ParameterList, gcmc.py:246-258), symmetric-
normalized bipartite propagation, relu, shared bias-free dense layer with
IDENTITY activation (act_dense, gcmc.py:237-297), bilinear multi-basis
decoder over class logits with 2-class cross-entropy pairwise training;
ranking scores are the raw class-1 logit (gcmc.py:195-211).

TPU re-design: the sparse A_hat @ H product is dense-MXU bipartite
propagation; the one-hot feature x weight sparse matmuls collapse to row
slices of the weight matrix; the reference's SparseDropout on the identity
features becomes per-node row dropout.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import dropout_apply
from ...utils.enums import InputType
from .. import register_model


@register_model("GCMC")
class GCMC(GeneralRecommender):
    input_type = InputType.PAIRWISE
    default_config = {"accum": "stack", "gcn_output_dim": 500,
                      "embedding_size": 64, "dropout_prob": 0.3,
                      "sparse_feature": True, "class_num": 2,
                      "num_basis_functions": 2, "training_neg_sample_num": 1}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.gcn_dim = config["gcn_output_dim"]
        self.dense_dim = config["embedding_size"]
        self.n_class = config["class_num"]
        self.n_basis = config["num_basis_functions"]
        self.dropout_prob = config["dropout_prob"]
        self.num_all = self.n_users + self.n_items
        # dense-MXU bipartite propagation (edge-list segment_sum with 500-dim
        # messages measured 43.6 s/epoch at ml-1m shape vs the reference's
        # 9.04 — the dense R @ H path is two matmuls)
        from ...ops.graph import BipartiteProp
        self.prop = BipartiteProp(dataset.inter_matrix("csr"),
                                  self.n_users, self.n_items)
        self.scan_epochs_ok = not self.prop.heavy

    def init_params(self, rng):
        ks = jax.random.split(rng, 4 + self.n_basis)
        # uniform ranges from the reference's _init_weights (gcmc.py:300-316)
        w_range = math.sqrt(2.0 / (self.num_all + self.gcn_dim))
        d_range = math.sqrt(2.0 / (self.dense_dim + self.gcn_dim))
        dec_range = math.sqrt(self.n_class / (self.n_basis + self.n_class))
        params = {
            # share_user_item_weights=True: ONE weight table serves both
            # user and item features (gcmc.py:246-258)
            "w": jax.random.uniform(ks[0], (self.num_all, self.gcn_dim),
                                    minval=-w_range, maxval=w_range),
            "dense_w": jax.random.uniform(
                ks[1], (self.gcn_dim, self.dense_dim),
                minval=-d_range, maxval=d_range),
            "dec_dense": jax.random.uniform(
                ks[2], (self.n_basis, self.n_class),
                minval=-dec_range, maxval=dec_range),
            "q": [],
            "_const": self.prop.init_consts(),
        }
        for i in range(self.n_basis):
            # 1.1-scaled orthogonal basis init (parity: gcmc.py orthogonal())
            a = jax.random.normal(ks[3 + i], (self.dense_dim, self.dense_dim))
            q, _ = jnp.linalg.qr(a)
            params["q"].append(1.1 * q)
        return params

    def _encode(self, params, rng=None):
        # identity features: user_X @ W = W[:n_users], item_X @ W = W[n_users:]
        h = params["w"]
        if rng is not None and self.dropout_prob > 0:
            # SparseDropout on the identity features == per-node row dropout
            # (gcmc.py:330-335 + get_sparse_eye_mat)
            rng, sk = jax.random.split(rng)
            keep = 1.0 - self.dropout_prob
            mask = jax.random.bernoulli(sk, keep, (self.num_all, 1))
            h = h * mask / keep
        agg = jax.nn.relu(self.prop(params["_const"], h))
        if rng is not None and self.dropout_prob > 0:
            rng, dk = jax.random.split(rng)
            agg = dropout_apply(dk, agg, self.dropout_prob)
        # bias-free dense layer with IDENTITY activation (act_dense)
        out = jnp.dot(agg, params["dense_w"],
                      preferred_element_type=jnp.float32)
        return out[:self.n_users], out[self.n_users:]

    def _class_logits(self, params, u_emb, i_emb):
        """(B, n_class) bilinear multi-basis decoder."""
        basis = [jnp.sum(jnp.dot(u_emb, q) * i_emb, axis=-1)
                 for q in params["q"]]
        basis = jnp.stack(basis, axis=1)                        # (B, n_basis)
        return jnp.dot(basis, params["dec_dense"])              # (B, n_class)

    def calculate_loss(self, params, batch, rng=None):
        ue, ie = self._encode(params, rng)
        user = batch[self.USER_ID]
        pos_logits = self._class_logits(params, ue[user],
                                        ie[batch[self.ITEM_ID]])
        neg_logits = self._class_logits(params, ue[user],
                                        ie[batch[self.NEG_ITEM_ID]])
        logits = jnp.concatenate([pos_logits, neg_logits], axis=0)
        target = jnp.concatenate(
            [jnp.ones(user.shape[0], jnp.int32),
             jnp.zeros(user.shape[0], jnp.int32)])
        w = batch.get("_weight")
        w2 = None if w is None else jnp.concatenate([w, w])
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, target[:, None], 1)[:, 0]
        if w2 is None:
            return jnp.mean(nll)
        return jnp.sum(nll * w2) / jnp.maximum(jnp.sum(w2), 1.0)

    def _scores(self, params, user, items=None):
        """Ranking score = class-1 logit (reference predict, gcmc.py:195-202)."""
        ue, ie = self._encode(params)
        if items is None:
            # all items: basis_k = (U Q_k) I^T
            basis = [jnp.dot(jnp.dot(ue[user], q), ie.T,
                             preferred_element_type=jnp.float32)
                     for q in params["q"]]
            basis = jnp.stack(basis, axis=-1)                   # (B, N, n_basis)
            logits = jnp.dot(basis, params["dec_dense"])        # (B, N, n_class)
            return logits[..., 1]
        logits = self._class_logits(params, ue[user], ie[items])
        return logits[..., 1]

    def predict(self, params, batch):
        return self._scores(params, batch[self.USER_ID], batch[self.ITEM_ID])

    def full_sort_predict(self, params, batch):
        return self._scores(params, batch[self.USER_ID])

    def score_items(self, params, batch, items):
        B, C = items.shape
        user = jnp.repeat(batch[self.USER_ID], C, axis=0)
        return self._scores(params, user, items.reshape(-1)).reshape(B, C)
