"""NNCF: neighborhood-enriched neural collaborative filtering.

Parity target: reference NNCF (recbole/model/general_recommender/nncf.py) —
GMF-style element-wise user*item vector concatenated with Conv1d+MaxPool
encodings of the user's item-neighborhood and the item's user-neighborhood;
MLP head with sigmoid/BCE. Neighborhoods are fixed at construction
(neigh_info_method): 'random' samples neigh_num interactions per node
(nncf.py:274-326); 'knn' here truncates/pads direct neighbors (the
reference's knn fallback augments short lists with similar nodes — the
padded direct list is the dominant term); 'louvain' (needs the external
python-louvain package in the reference) is not supported.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import mlp_init, mlp_apply, normal_init, xavier_normal
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model
from ...data.dataset import build_history_matrix


@register_model("NNCF")
class NNCF(GeneralRecommender):
    input_type = InputType.POINTWISE
    full_sort_fallback = True
    default_config = {"ui_embedding_size": 64, "neigh_embedding_size": 32,
                      "num_conv_kernel": 128, "conv_kernel_size": 5,
                      "pool_kernel_size": 5,
                      "mlp_hidden_size": [128, 64, 32, 16], "neigh_num": 20,
                      "dropout": 0.5, "neigh_info_method": "random",
                      "resolution": 1.0, "training_neg_sample_num": 1}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.ui_emb = config["ui_embedding_size"]
        self.neigh_emb = config["neigh_embedding_size"]
        self.n_kernel = config["num_conv_kernel"]
        self.kernel = config["conv_kernel_size"]
        self.pool = config["pool_kernel_size"]
        self.mlp_hidden = list(config["mlp_hidden_size"])
        self.neigh_num = config["neigh_num"]
        self.dropout = config["dropout"]
        method = config["neigh_info_method"]
        if method not in ("random", "knn"):
            raise ValueError("neigh_info_method must be 'random' or 'knn' "
                             "(louvain needs an external community package)")

        uids = np.asarray(dataset.inter_feat[dataset.uid_field])
        iids = np.asarray(dataset.inter_feat[dataset.iid_field])
        u_hist, u_len = build_history_matrix(uids, iids, self.n_users)
        i_hist, i_len = build_history_matrix(iids, uids, self.n_items)
        rng = np.random.RandomState(config["seed"] or 0)
        self.u_neigh = self.register_const("u_neigh", 
            self._fixed_neigh(u_hist, u_len, rng, method))
        self.i_neigh = self.register_const("i_neigh", 
            self._fixed_neigh(i_hist, i_len, rng, method))

        conved = self.neigh_num - (self.kernel - 1)
        self.pooled = (conved - (self.pool - 1) - 1) // self.pool + 1
        self.mlp_dims = [2 * self.pooled * self.n_kernel + self.ui_emb] \
            + self.mlp_hidden

    def _fixed_neigh(self, hist, lens, rng, method):
        n, width = hist.shape
        K = self.neigh_num
        out = np.zeros((n, K), np.int32)
        for r in range(n):
            c = int(lens[r])
            if c == 0:
                continue
            if method == "random":
                # K samples WITH replacement whatever the true count
                # (reference get_neigh_random, nncf.py:275-307)
                out[r] = hist[r, rng.randint(0, c, size=K)]
            else:
                take = min(c, K)
                out[r, :take] = hist[r, :take]
        return out

    def init_params(self, rng):
        ks = jax.random.split(rng, 9)
        params = {
            "user_embedding": normal_init(ks[0], (self.n_users, self.ui_emb)),
            "item_embedding": normal_init(ks[1], (self.n_items, self.ui_emb)),
            "user_neigh_embedding": normal_init(
                ks[2], (self.n_items, self.neigh_emb)),
            "item_neigh_embedding": normal_init(
                ks[3], (self.n_users, self.neigh_emb)),
            "user_conv_w": xavier_normal(
                ks[4], (self.n_kernel, self.neigh_emb, self.kernel)),
            "user_conv_b": jnp.zeros((self.n_kernel,)),
            "item_conv_w": xavier_normal(
                ks[5], (self.n_kernel, self.neigh_emb, self.kernel)),
            "item_conv_b": jnp.zeros((self.n_kernel,)),
            "mlp": mlp_init(ks[6], self.mlp_dims),
            "out_w": xavier_normal(ks[7], (self.mlp_dims[-1], 1)),
            "out_b": jnp.zeros(()),
        }
        return params

    def _conv_pool(self, emb, w, b):
        """emb: (B, K, E) -> conv over K -> maxpool -> relu -> flat."""
        x = emb.transpose(0, 2, 1)                              # (B, E, K)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32) + b[None, :, None]
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, self.pool), (1, 1, self.pool),
            "VALID")
        x = jax.nn.relu(x)
        return x.reshape(x.shape[0], -1)

    def _logits(self, params, user, item, rng=None):
        u = params["user_embedding"][user]
        v = params["item_embedding"][item]
        un = params["user_neigh_embedding"][self.u_neigh[user]]
        vn = params["item_neigh_embedding"][self.i_neigh[item]]
        u_conv = self._conv_pool(un, params["user_conv_w"],
                                 params["user_conv_b"])
        i_conv = self._conv_pool(vn, params["item_conv_w"],
                                 params["item_conv_b"])
        x = jnp.concatenate([u * v, u_conv, i_conv], axis=-1)
        x = mlp_apply(params["mlp"], x, act="relu",
                      dropout=self.dropout if rng is not None else 0.0,
                      rng=rng)
        return jnp.dot(x, params["out_w"])[:, 0] + params["out_b"]

    def calculate_loss(self, params, batch, rng=None):
        logits = self._logits(params, batch[self.USER_ID],
                              batch[self.ITEM_ID], rng)
        return bce_loss(logits, batch[self.LABEL].astype(jnp.float32),
                        batch.get("_weight"))

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._logits(params, batch[self.USER_ID], batch[self.ITEM_ID]))

    def score_items(self, params, batch, items):
        B, C = items.shape
        user = jnp.repeat(batch[self.USER_ID], C, axis=0)
        return self._logits(params, user, items.reshape(-1)).reshape(B, C)
