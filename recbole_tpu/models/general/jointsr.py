"""JOINTSR / JOINTSRMLPSPARSE / JOINTSRUSERMF: remaining fork joint models.

Parity targets:
  * JOINTSR (fork jointsr.py:12): MLP scoring tower + item LM loss.
  * JOINTSRMLPSPARSE (fork jointsrmlpsparse.py): the same with sparse LM labels.
  * JOINTSRUSERMF (fork jointsrusermf.py): biased MF with SEPARATE item and
    user LM losses (alpha / alpha_user) built from item and user text fields;
    returns (loss_rec, alpha*lm_item, alpha_user*lm_user).
"""

import jax
import jax.numpy as jnp

from ..layers import normal_init, mlp_init, xavier_uniform
from ..losses import bce_loss
from ...utils.enums import InputType
from .. import register_model
from .jointsrmf import JOINTSRMF
from .jointsr_base import (load_word_vectors, LMTargets, collect_text_vocab,
                           resolve_text_fields)


@register_model("JOINTSR")
class JOINTSR(JOINTSRMF):
    """MLP tower + LM loss."""

    default_config = {**JOINTSRMF.default_config,
                      "ff_layers": [50, 25], "dropout": 0.2,
                      "mlp_variant": "mul"}  # fc_layers(mul(u, i)), jointsr.py:99-104

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.ff_layers = list(config["ff_layers"])
        self.variant = config["mlp_variant"]
        self.in_dim = self.embedding_dim * (2 if self.variant == "cat" else 1)

    def init_params(self, rng):
        params = super().init_params(rng)
        km, ko = jax.random.split(jax.random.fold_in(rng, 99))
        params["mlp"] = mlp_init(km, [self.in_dim] + self.ff_layers,
                                 "xavier_uniform")
        params["out_w"] = xavier_uniform(ko, (self.ff_layers[-1], 1))
        params["out_b"] = jnp.zeros(1)
        return params

    def _rec_logits(self, params, user, item):
        u = params["user_embedding"][user]
        i = params["item_embedding"][item]
        x = jnp.concatenate([u, i], -1) if self.variant == "cat" else u * i
        for layer in params["mlp"]:
            x = jax.nn.relu(jnp.dot(x, layer["w"],
                                    preferred_element_type=jnp.float32)
                            + layer["b"])
        return jnp.dot(x, params["out_w"],
                       preferred_element_type=jnp.float32)[:, 0] + params["out_b"][0]

    # MLP scoring has no cheap all-items matmul; force the trainer's chunked
    # predict fallback
    full_sort_fallback = True


@register_model("JOINTSRMLPSPARSE")
class JOINTSRMLPSPARSE(JOINTSR):
    """NOTE: the fork's jointsrmlpsparse.py:155 references an undefined
    `indiceis` variable — the reference model cannot even construct; this
    implements the evident intent (JOINTSR tower + sparse LM labels). LM
    weight key is alpha_item (jointsrmlpsparse.py:25)."""
    lm_sparse = True
    default_config = {**JOINTSR.default_config, "alpha_item": 1.0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.alpha = config["alpha_item"]


@register_model("JOINTSRUSERMF")
class JOINTSRUSERMF(JOINTSRMF):
    default_config = {**JOINTSRMF.default_config, "alpha_item": 1.0,
                      "alpha_user": 1.0, "user_description_fields": None}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        # reference keys: alpha_item / alpha_user (jointsrusermf.py:24-25)
        self.alpha = config["alpha_item"]
        self.alpha_user = config["alpha_user"]
        ufields = resolve_text_fields(dataset, dataset.user_feat,
                                      config["user_description_fields"])
        if dataset.user_feat is None or not ufields:
            raise ValueError("JOINTSRUSERMF needs token_seq text fields in "
                             "the .user table")
        vocab_hint = collect_text_vocab(dataset, dataset.user_feat, ufields)
        vocab, vectors = load_word_vectors(config["word_embedding_path"],
                                           self.embedding_dim, vocab_hint)
        self.user_word_embedding = self.register_const("user_word_embedding", vectors)
        self.user_vocab_size = vectors.shape[0]
        word2idx = {w: i for i, w in enumerate(vocab)}
        self.user_lm_gt = LMTargets(dataset, dataset.user_feat, ufields,
                                    word2idx)

    def _user_lm_loss(self, params, user, weight):
        logits = jnp.dot(params["user_embedding"][user],
                         self.user_word_embedding.T,
                         preferred_element_type=jnp.float32)
        tgt = self.user_lm_gt.dense_targets(user, self.user_vocab_size)
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
        lm_item = self._lm_loss(params, item, w)
        lm_user = self._user_lm_loss(params, user, w)
        return loss_rec, self.alpha * lm_item, self.alpha_user * lm_user
