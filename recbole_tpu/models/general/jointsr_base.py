"""Shared machinery for the fork's JointSR model family.

Parity target: the ghazalehnt fork's jointsr*.py models
(recbole/model/general_recommender/jointsrmf.py:15-238 and siblings) — joint
recommendation + language-model loss: item (or user) embeddings predict the
unigram distribution of the entity's text through FROZEN pretrained word
embeddings; total loss returned as a tuple (loss_rec, alpha * loss_lm).

Deviations from the fork, by design:
  * Word embeddings are pluggable via config['word_embedding_path'] (a .npz
    with 'vocab' and 'vectors', or a word2vec .txt). The fork hard-downloads
    glove-wiki-gigaword-50 via gensim (jointsrmf.py:44-52), which needs
    network access; with no path we fall back to deterministic random vectors
    (hash-seeded) so the models run offline — supply GloVe for paper parity.
  * Text comes from token_seq fields of the .item/.user tables by FIELD NAME
    (config['item_text_fields']), not hard-coded column indices
    (jointsrmf.py:60-66).
  * The fork's three 'debug_variant' dense-label builders (jointsrmf.py:200-227)
    are one vectorized scatter here.
"""

import hashlib
import os

import numpy as np
import jax.numpy as jnp

from ...utils.enums import FeatureType


def load_word_vectors(path, dim, vocab_hint=None):
    """Return (vocab: list[str], vectors: (V, dim) float32)."""
    if path and os.path.isfile(path):
        if path.endswith(".npz"):
            data = np.load(path, allow_pickle=True)
            return list(data["vocab"]), data["vectors"].astype(np.float32)
        vocab, vecs = [], []
        with open(path, "r", encoding="utf-8") as fh:
            first = fh.readline().split()
            if len(first) != 2:  # no header: first line is a vector
                vocab.append(first[0])
                vecs.append([float(x) for x in first[1:]])
            for line in fh:
                parts = line.rstrip().split(" ")
                vocab.append(parts[0])
                vecs.append([float(x) for x in parts[1:]])
        return vocab, np.asarray(vecs, np.float32)
    # offline fallback: deterministic per-word random vectors
    vocab = sorted(vocab_hint or [])
    vecs = np.zeros((len(vocab), dim), np.float32)
    for i, w in enumerate(vocab):
        seed = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little")
        vecs[i] = np.random.RandomState(seed).normal(0, 0.3, dim)
    return vocab, vecs


class LMTargets:
    """Per-entity unigram ground truth over a word vocabulary.

    Built from token_seq fields of an aligned side table (row i = entity id i).
    Stored as padded (n, W) key/value arrays: keys index the word vocabulary,
    -1 padding; values are normalized to probabilities (jointsrmf.py:142-152).
    """

    def __init__(self, dataset, table, text_fields, word2idx,
                 length_offset=0):
        """length_offset=1 reproduces JOINTSRMFFULL's off-by-one: its
        lm_gt_len starts at torch.ones, so probabilities are divided by
        (count + 1) (jointsrmffull.py:56-57)."""
        n = len(next(iter(table.values())))
        keys_t = [[] for _ in range(n)]
        vals_t = [[] for _ in range(n)]
        for field in text_fields:
            if field not in table:
                continue
            if dataset.field2type[field] is not FeatureType.TOKEN_SEQ:
                continue
            id2tok = dataset.field2id_token[field]
            for row in range(n):
                for tok_id in table[field][row]:
                    term = id2tok[tok_id]
                    wi = word2idx.get(term)
                    if wi is None:
                        continue
                    if wi in keys_t[row]:
                        vals_t[row][keys_t[row].index(wi)] += 1
                    else:
                        keys_t[row].append(wi)
                        vals_t[row].append(1)
        width = max((len(k) for k in keys_t), default=0) + 1
        keys = np.full((n, width), -1, np.int32)
        vals = np.zeros((n, width), np.float32)
        for r in range(n):
            k = len(keys_t[r])
            if k:
                keys[r, :k] = keys_t[r]
                vals[r, :k] = vals_t[r]
        sums = vals.sum(1, keepdims=True) + length_offset
        vals = np.divide(vals, sums, out=np.zeros_like(vals), where=sums > 0)
        self.keys = jnp.asarray(keys)
        self.values = jnp.asarray(vals)
        self.width = width
        # unigram counts for NCE noise distributions
        uni = np.zeros(len(word2idx), np.float64)
        for r in range(n):
            for k, v in zip(keys_t[r], vals_t[r]):
                uni[k] += v
        self.unigram = uni

    def dense_targets(self, entity_ids, vocab_size):
        """(B, V) scattered probability targets — replaces the fork's
        debug_variant loops with one scatter-add."""
        k = self.keys[entity_ids]                              # (B, W)
        v = self.values[entity_ids]
        ok = k >= 0
        B = entity_ids.shape[0]
        tgt = jnp.zeros((B, vocab_size), jnp.float32)
        rows = jnp.arange(B)[:, None]
        return tgt.at[rows, jnp.where(ok, k, 0)].add(jnp.where(ok, v, 0.0))


def collect_text_vocab(dataset, table, text_fields):
    """All word strings appearing in the chosen token_seq fields."""
    vocab = set()
    for field in text_fields:
        if table is not None and field in table \
                and dataset.field2type[field] is FeatureType.TOKEN_SEQ:
            vocab.update(dataset.field2id_token[field][1:].tolist())
    return vocab


def resolve_text_fields(dataset, table, configured):
    """config list or default = every token_seq field of the table."""
    if configured:
        return list(configured)
    if table is None:
        return []
    return [f for f in table
            if dataset.field2type.get(f) is FeatureType.TOKEN_SEQ]
