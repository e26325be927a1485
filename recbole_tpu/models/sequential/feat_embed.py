"""Item-feature embedding for feature-rich sequential models.

Parity target: reference ContextSeqEmbAbstractLayer / FeatureSeqEmbLayer
(recbole/model/layers.py:554-826) used by DIN/DIEN/GRU4RecF/SASRecF/FDSA —
per-field embeddings of item side features, pooled for token_seq fields.

TPU re-design: the aligned item feature table (row i = item id i) is a set of
device-resident constant arrays captured at model construction; embedding a
batch of item ids is one gather per field — no host-side pandas joins per
batch (the reference joins feature frames inside the dataloader).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..layers import xavier_normal
from ...utils.enums import FeatureType, FeatureSource


class ItemFeatEmbedder:
    """Embeds item ids into per-field feature vectors: (..., F, D).

    Field 0 is always the item id itself; subsequent fields follow the
    dataset's item-feature schema (token, float, token_seq with mean/max/sum
    pooling).
    """

    def __init__(self, dataset, selected_features=None, pooling="mean",
                 include_item_id=True, side="item"):
        self.pooling = pooling
        self.include_item_id = include_item_id
        self.side = side
        if side == "item":
            feat = dataset.item_feat or {}
            key_field = dataset.iid_field
            self.n_items = dataset.item_num
        else:  # user side (DIEN's ContextSeqEmbLayer user stream)
            feat = dataset.user_feat or {}
            key_field = dataset.uid_field
            self.n_items = dataset.user_num
        self.id_key = ("item_embedding" if side == "item"
                       else "user_embedding")
        self.token_fields = []     # (field, vocab, (n_rows,) ids)
        self.float_fields = []     # (field, (n_rows,) values)
        self.seq_fields = []       # (field, vocab, (n_rows, L) ids, lens)
        # fields walk in selected_features order when given (the reference's
        # field_names iteration, layers.py:576-587), else dataset order
        if selected_features is not None:
            names = [f for f in selected_features if f in feat]
        else:
            names = [f for f in feat if f != key_field]
        for field in names:
            col = feat[field]
            if field == key_field:
                continue
            ftype = dataset.field2type[field]
            if ftype is FeatureType.TOKEN:
                self.token_fields.append(
                    (field, dataset.num(field), jnp.asarray(col.astype(np.int32))))
            elif ftype is FeatureType.FLOAT:
                self.float_fields.append(
                    (field, jnp.asarray(col.astype(np.float32))))
            elif ftype is FeatureType.TOKEN_SEQ:
                lens = np.array([len(s) for s in col], np.int32)
                L = max(int(lens.max()) if len(lens) else 1, 1)
                padded = np.zeros((len(col), L), np.int32)
                for r, s in enumerate(col):
                    padded[r, :len(s)] = s
                self.seq_fields.append((field, dataset.num(field),
                                        jnp.asarray(padded), jnp.asarray(lens)))

    @property
    def num_fields(self):
        """Feature fields (+1 for the item-id field when included)."""
        return (1 if self.include_item_id else 0) + len(self.token_fields) \
            + len(self.float_fields) + len(self.seq_fields)

    def init(self, rng, emb_size, frozen_item_id=True):
        """N(0,1) FROZEN tables, to live under params["_const"].

        The reference keeps these embedding tables in plain python dicts —
        not nn.ModuleDict (layers.py:566-611) — so they are invisible to
        state_dict, to .apply(xavier_normal_initialization) and to the
        optimizer: they keep torch's default N(0,1) Embedding init and
        never train. Models reproduce that by putting this dict under
        params["_const"] (masked out of the optimizer)."""
        params = {}
        if self.include_item_id and frozen_item_id:
            # DIN/DIEN's id table lives INSIDE the unregistered layer
            # (frozen); SASRecF/FDSA register their own trainable
            # item_embedding at the top level, which _get prefers —
            # they pass frozen_item_id=False to skip this dead copy
            rng, k = jax.random.split(rng)
            params[self.id_key] = jax.random.normal(
                k, (self.n_items, emb_size))
        for field, vocab, _ in self.token_fields:
            rng, k = jax.random.split(rng)
            params[f"feat_{field}"] = jax.random.normal(k, (vocab, emb_size))
        for field, _ in self.float_fields:
            rng, k = jax.random.split(rng)
            params[f"feat_{field}"] = jax.random.normal(k, (1, emb_size))
        for field, vocab, _, _ in self.seq_fields:
            rng, k = jax.random.split(rng)
            params[f"feat_{field}"] = jax.random.normal(k, (vocab, emb_size))
        return params

    @staticmethod
    def _get(params, key):
        """Top-level (trainable) params win over the frozen _const copy."""
        if key in params:
            return params[key]
        return params["_const"][key]

    def embed(self, params, items):
        """items: int array of any shape -> (*items.shape, F, D).

        Field order matches the reference's [sparse(token, token_seq),
        dense(float)] concatenation (layers.py:755-766 + the caller's
        feature_table append order)."""
        parts = []
        if self.include_item_id:
            parts.append(self._get(params, self.id_key)[items][..., None, :])
        for field, _, ids in self.token_fields:
            parts.append(self._get(params, f"feat_{field}")[ids[items]][..., None, :])
        for field, _, padded, lens in self.seq_fields:
            member = self._get(params, f"feat_{field}")[padded[items]]   # (..., L, D)
            ln = lens[items]
            valid = (jnp.arange(padded.shape[1]) <
                     ln[..., None]).astype(jnp.float32)[..., None]
            if self.pooling == "max":
                # emb − (1−mask)·1e9 (layers.py:683-688), NOT a hard where
                pooled = jnp.max(member - (1.0 - valid) * 1e9, axis=-2)
            elif self.pooling == "sum":
                pooled = jnp.sum(member * valid, axis=-2)
            else:
                pooled = jnp.sum(member * valid, axis=-2) \
                    / (ln[..., None].astype(jnp.float32) + 1e-8)
            parts.append(pooled[..., None, :])
        for field, vals in self.float_fields:
            parts.append((self._get(params, f"feat_{field}")[0]
                          * vals[items][..., None])[..., None, :])
        return jnp.concatenate(parts, axis=-2)

    def embed_flat(self, params, items):
        """(*items.shape, F*D) — fields concatenated."""
        e = self.embed(params, items)
        return e.reshape(e.shape[:-2] + (-1,))
