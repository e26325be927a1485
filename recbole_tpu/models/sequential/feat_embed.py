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
                 include_item_id=True):
        self.pooling = pooling
        self.include_item_id = include_item_id
        self.n_items = dataset.item_num
        self.token_fields = []     # (field, vocab, (n_items,) ids)
        self.float_fields = []     # (field, (n_items,) values)
        self.seq_fields = []       # (field, vocab, (n_items, L) ids, lens)
        feat = dataset.item_feat or {}
        for field, col in feat.items():
            if field == dataset.iid_field:
                continue
            if selected_features is not None and field not in selected_features:
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

    def init(self, rng, emb_size):
        params = {}
        if self.include_item_id:
            rng, k = jax.random.split(rng)
            params["item_embedding"] = xavier_normal(
                k, (self.n_items, emb_size)).at[0].set(0.0)
        for field, vocab, _ in self.token_fields:
            rng, k = jax.random.split(rng)
            params[f"feat_{field}"] = xavier_normal(k, (vocab, emb_size)) \
                .at[0].set(0.0)
        for field, _ in self.float_fields:
            rng, k = jax.random.split(rng)
            params[f"feat_{field}"] = xavier_normal(k, (1, emb_size))
        for field, vocab, _, _ in self.seq_fields:
            rng, k = jax.random.split(rng)
            params[f"feat_{field}"] = xavier_normal(k, (vocab, emb_size)) \
                .at[0].set(0.0)
        return params

    def embed(self, params, items):
        """items: int array of any shape -> (*items.shape, F, D)."""
        parts = []
        if self.include_item_id:
            parts.append(params["item_embedding"][items][..., None, :])
        for field, _, ids in self.token_fields:
            parts.append(params[f"feat_{field}"][ids[items]][..., None, :])
        for field, vals in self.float_fields:
            parts.append((params[f"feat_{field}"][0]
                          * vals[items][..., None])[..., None, :])
        for field, _, padded, lens in self.seq_fields:
            member = params[f"feat_{field}"][padded[items]]   # (..., L, D)
            ln = lens[items]
            valid = (jnp.arange(padded.shape[1]) <
                     ln[..., None]).astype(jnp.float32)[..., None]
            if self.pooling == "max":
                pooled = jnp.max(jnp.where(valid > 0, member, -1e9), axis=-2)
            elif self.pooling == "sum":
                pooled = jnp.sum(member * valid, axis=-2)
            else:
                pooled = jnp.sum(member * valid, axis=-2) \
                    / jnp.maximum(ln[..., None], 1)
            parts.append(pooled[..., None, :])
        return jnp.concatenate(parts, axis=-2)

    def embed_flat(self, params, items):
        """(*items.shape, F*D) — fields concatenated."""
        e = self.embed(params, items)
        return e.reshape(e.shape[:-2] + (-1,))
