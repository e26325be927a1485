"""JOINTSRMF: biased MF + item language-model loss (fork model).

Parity target: fork JOINTSRMF
(recbole/model/general_recommender/jointsrmf.py:15-238) — MFSimple-style
biased MF with BCE rec loss, plus alpha * SoftCrossEntropy LM loss: item
embedding dotted with FROZEN word embeddings must predict the item text's
unigram distribution. Returns the (loss_rec, alpha*loss_lm) tuple. The
embedding dimension must equal the word-vector dimension (the fork pins 50).
"""

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import normal_init
from ..losses import bce_loss, soft_ce_loss
from ...utils.enums import InputType
from .. import register_model
from .jointsr_base import (load_word_vectors, LMTargets, collect_text_vocab,
                           resolve_text_fields)


@register_model("JOINTSRMF")
class JOINTSRMF(GeneralRecommender):
    input_type = InputType.POINTWISE
    default_config = {"embedding_dimension": 50, "alpha": 1.0,
                      "item_description_fields": None,
                      "item_text_fields": None,
                      "word_embedding_path": None,
                      "training_neg_sample_num": 8,
                      "learning_rate": 0.002, "weight_decay": 1e-8}

    lm_sparse = False       # JOINTSRMFSPARSE overrides
    lm_length_offset = 0    # JOINTSRMFFULL overrides (its +1 length quirk)

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.embedding_dim = config["embedding_dimension"]
        self.alpha = config["alpha"]

        fields = resolve_text_fields(dataset, dataset.item_feat,
                                     config["item_description_fields"]
                                     or config["item_text_fields"])
        if dataset.item_feat is None or not fields:
            raise ValueError("JOINTSR models need token_seq text fields in "
                             "the .item table (config item_description_fields)")
        vocab_hint = collect_text_vocab(dataset, dataset.item_feat, fields)
        vocab, vectors = load_word_vectors(config["word_embedding_path"],
                                           self.embedding_dim, vocab_hint)
        if vectors.shape[1] != self.embedding_dim:
            raise ValueError(f"word vectors dim {vectors.shape[1]} != "
                             f"embedding_dimension {self.embedding_dim}")
        self.word_embedding = self.register_const("word_embedding", vectors)   # frozen, not in params
        self.vocab_size = vectors.shape[0]
        word2idx = {w: i for i, w in enumerate(vocab)}
        self.lm_gt = LMTargets(dataset, dataset.item_feat, fields, word2idx,
                               length_offset=self.lm_length_offset)

    def init_params(self, rng):
        ku, ki = jax.random.split(rng)
        return {
            "user_embedding": normal_init(ku, (self.n_users, self.embedding_dim)),
            "item_embedding": normal_init(ki, (self.n_items, self.embedding_dim)),
            "user_bias": jnp.zeros(self.n_users),
            "item_bias": jnp.zeros(self.n_items),
            "bias": jnp.zeros(1),
        }

    def _rec_logits(self, params, user, item):
        u = params["user_embedding"][user]
        i = params["item_embedding"][item]
        return (jnp.sum(u * i, -1) + params["user_bias"][user]
                + params["item_bias"][item] + params["bias"][0])

    def _lm_loss(self, params, item, weight):
        logits = jnp.dot(params["item_embedding"][item], self.word_embedding.T,
                         preferred_element_type=jnp.float32)
        if self.lm_sparse:
            # the reference's SPARSE variants store labels sparsely but the
            # soft-CE softmax still runs over the FULL vocabulary
            # (jointsrmfsparse.py:180-195 densifies before
            # SoftCrossEntropyLoss); same value here without materializing
            # (B, V) targets: -Σ v_k logp[k] = logZ·Σv − Σ v_k logits[k]
            k = self.lm_gt.keys[item]
            v = self.lm_gt.values[item]
            ok = k >= 0
            sub = jnp.take_along_axis(logits, jnp.where(ok, k, 0), 1)
            logz = jax.scipy.special.logsumexp(logits, axis=-1)
            vs = jnp.where(ok, v, 0.0)
            per_row = logz * jnp.sum(vs, -1) - jnp.sum(vs * sub, -1)
        else:
            tgt = self.lm_gt.dense_targets(item, self.vocab_size)
            logp = jax.nn.log_softmax(logits, -1)
            per_row = -jnp.sum(tgt * logp, -1)
        if weight is None:
            return jnp.mean(per_row)
        return jnp.sum(per_row * weight) / jnp.maximum(jnp.sum(weight), 1.0)

    def calculate_loss(self, params, batch, rng=None):
        user, item = batch[self.USER_ID], batch[self.ITEM_ID]
        w = batch.get("_weight")
        loss_rec = bce_loss(self._rec_logits(params, user, item),
                            batch[self.LABEL], w)
        loss_lm = self._lm_loss(params, item, w)
        return loss_rec, self.alpha * loss_lm

    def predict(self, params, batch):
        return jax.nn.sigmoid(
            self._rec_logits(params, batch[self.USER_ID], batch[self.ITEM_ID]))

    def full_sort_predict(self, params, batch):
        u = params["user_embedding"][batch[self.USER_ID]]
        scores = jnp.dot(u, params["item_embedding"].T,
                         preferred_element_type=jnp.float32)
        return scores + params["user_bias"][batch[self.USER_ID]][:, None] \
            + params["item_bias"][None, :] + params["bias"][0]


@register_model("JOINTSRMFFULL")
class JOINTSRMFFULL(JOINTSRMF):
    """Dense-vocabulary LM variant (fork jointsrmffull.py): same math as
    JOINTSRMF except its lm_gt_len starts at torch.ones, so targets are
    divided by count+1 (jointsrmffull.py:56-57)."""
    lm_sparse = False
    lm_length_offset = 1


@register_model("JOINTSRMFSPARSE")
class JOINTSRMFSPARSE(JOINTSRMF):
    """Sparse-LABEL variant (fork jointsrmfsparse.py): labels live in a
    sparse tensor but the soft-CE softmax still spans the full vocabulary;
    our lm_sparse path computes the identical value from the keys. The LM
    weight is config alpha_item here (jointsrmfsparse.py:24), not alpha."""
    lm_sparse = True
    default_config = {**JOINTSRMF.default_config, "alpha_item": 1.0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.alpha = config["alpha_item"]


@register_model("JOINTSRMFNEGS")
class JOINTSRMFNEGS(JOINTSRMF):
    """NCE-style LM variant (fork jointsrmfnegs.py, using the fork's
    SoftCrossEntropyLossByNegSampling, loss.py:125-166): softmax over the
    item's target words plus noise words drawn from unigram^beta."""

    default_config = {**JOINTSRMF.default_config,
                      "lm_negative_samples": 64, "lm_noise_beta": 0.75}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.lm_neg = config["lm_negative_samples"]
        beta = config["lm_noise_beta"]
        noise = self.lm_gt.unigram ** beta
        noise = noise / max(noise.sum(), 1e-12)
        # alias-free sampling: precomputed cdf inversion table
        import numpy as np
        cdf = np.cumsum(noise)
        table = np.searchsorted(cdf, (np.arange(65536) + 0.5) / 65536)
        self._noise_table = self.register_const("_noise_table", table.astype(np.int32))

    def _lm_loss(self, params, item, weight, rng=None):
        k = self.lm_gt.keys[item]
        v = self.lm_gt.values[item]
        ok = k >= 0
        if rng is None:
            rng = jax.random.key(0)
        B = item.shape[0]
        noise_idx = jax.random.randint(rng, (B, self.lm_neg), 0,
                                       self._noise_table.shape[0])
        noise = self._noise_table[noise_idx]
        cand = jnp.concatenate([jnp.where(ok, k, 0), noise], 1)
        item_e = params["item_embedding"][item]
        logits = jnp.einsum("bd,bcd->bc", item_e, self.word_embedding[cand],
                            preferred_element_type=jnp.float32)
        mask = jnp.concatenate(
            [ok, jnp.ones((B, self.lm_neg), bool)], 1)
        logits = jnp.where(mask, logits, -1e9)
        tgt = jnp.concatenate([v, jnp.zeros((B, self.lm_neg))], 1)
        logp = jax.nn.log_softmax(logits, -1)
        per_row = -jnp.sum(tgt * logp, -1)
        if weight is None:
            return jnp.mean(per_row)
        return jnp.sum(per_row * weight) / jnp.maximum(jnp.sum(weight), 1.0)

    def calculate_loss(self, params, batch, rng=None):
        user, item = batch[self.USER_ID], batch[self.ITEM_ID]
        w = batch.get("_weight")
        loss_rec = bce_loss(self._rec_logits(params, user, item),
                            batch[self.LABEL], w)
        loss_lm = self._lm_loss(params, item, w, rng)
        return loss_rec, self.alpha * loss_lm
