"""RaCT: ranking-critical training (actor/critic over a MultiVAE actor).

Parity target: reference RaCT (recbole/model/general_recommender/ract.py) +
RaCTTrainer (trainer.py:804-863) — a MultiVAE-style actor whose per-user ELBO
feeds a small critic that predicts NDCG@k from (seen count, unseen count,
actor loss); 3 stages selected by config train_stage: actor_pretrain (train
actor), critic_pretrain (freeze actor, regress critic onto true NDCG),
finetune (freeze critic, maximize critic output). Stage hand-off goes
through pre_model_path checkpoints (our pickle format).

Gradient gating is stop_gradient-based: each stage's frozen subset receives
exactly-zero gradients, matching the reference's requires_grad_(False) since
stages run as separate processes with fresh optimizer state.
"""

import pickle

import jax
import jax.numpy as jnp

from ..base import GeneralRecommender
from ..layers import mlp_init, dropout_apply
from ...utils.enums import InputType
from .. import register_model


@register_model("RaCT")
class RaCT(GeneralRecommender):
    input_type = InputType.LISTWISE
    train_batch_kind = "user"
    default_config = {"mlp_hidden_size": [600], "latent_dimension": 256,
                      "dropout_prob": 0.5, "anneal_cap": 0.2,
                      "total_anneal_steps": 200000,
                      "critic_layers": [100, 100, 10], "metrics_k": 100,
                      "train_stage": "actor_pretrain", "pre_model_path": "",
                      "training_neg_sample_num": 0}

    def __init__(self, config, dataset):
        super().__init__(config, dataset)
        self.layers = list(config["mlp_hidden_size"])
        self.lat_dim = config["latent_dimension"]
        self.drop_out = config["dropout_prob"]
        self.anneal_cap = config["anneal_cap"]
        self.total_anneal_steps = config["total_anneal_steps"]
        self.critic_layers = list(config["critic_layers"])
        self.metrics_k = config["metrics_k"]
        self.train_stage = config["train_stage"]
        self.pre_model_path = config["pre_model_path"]
        if self.train_stage not in ("actor_pretrain", "critic_pretrain",
                                    "finetune"):
            raise ValueError("train_stage must be actor_pretrain / "
                             "critic_pretrain / finetune")
        self.init_history(dataset)
        self.enc_dims = [self.n_items] + self.layers + [self.lat_dim]
        self.dec_dims = [self.lat_dim // 2] + self.layers[::-1] \
            + [self.n_items]
        self.critic_dims = [3] + self.critic_layers + [1]

    def init_params(self, rng):
        ke, kd, kc = jax.random.split(rng, 3)
        params = {"encoder": mlp_init(ke, self.enc_dims, "xavier_normal"),
                  "decoder": mlp_init(kd, self.dec_dims, "xavier_normal"),
                  "critic": mlp_init(kc, self.critic_dims, "xavier_normal"),
                  # the reference critic's leading BatchNorm1d(3) affine
                  "critic_bn_g": jnp.ones(3), "critic_bn_b": jnp.zeros(3)}
        if self.train_stage != "actor_pretrain" and self.pre_model_path:
            with open(self.pre_model_path, "rb") as fh:
                state = pickle.load(fh)
            params = jax.tree.map(jnp.asarray, state["params"])
        return params


    def _mlp(self, layers, x, act=jnp.tanh):
        n = len(layers)
        for li, layer in enumerate(layers):
            x = jnp.dot(x, layer["w"],
                        preferred_element_type=jnp.float32) + layer["b"]
            if li < n - 1:
                x = act(x)
        return x

    def _actor(self, params, x, rng):
        """Returns (logits, per-user actor loss, aux dict for the critic)."""
        t = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        if rng is not None and self.drop_out > 0:
            rng, dk = jax.random.split(rng)
            keep = jax.random.bernoulli(dk, 1.0 - self.drop_out, t.shape)
            h = jnp.where(keep, t, 0.0)  # unscaled dropout (ract.py:150)
        else:
            # eval keeps the reference's odd (1-p) input scaling:
            # F.dropout(training=False) is identity, then * (1 - drop_out)
            h = t * (1.0 - self.drop_out)
        seen = jnp.sum((h != 0).astype(jnp.float32), axis=1)
        mask = (h > 0) & (t > 0)
        true_matrix = t * (~mask).astype(jnp.float32)
        unseen = jnp.sum((true_matrix != 0).astype(jnp.float32), axis=1)

        enc = self._mlp(params["encoder"], h)
        half = self.lat_dim // 2
        mu, logvar = enc[:, :half], enc[:, half:]
        if rng is not None:
            rng, zk = jax.random.split(rng)
            z = mu + 0.01 * jnp.exp(0.5 * logvar) \
                * jax.random.normal(zk, mu.shape)
        else:
            z = mu
        logits = self._mlp(params["decoder"], z)
        kl = -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=1)
        ce = -jnp.sum(jax.nn.log_softmax(logits, -1) * x, axis=1)
        aux = {"input": h, "true": true_matrix, "pred": logits,
               "seen": seen, "unseen": unseen}
        return logits, ce, kl, aux

    def _anneal(self, batch):
        step = batch.get("_step", jnp.int32(0)).astype(jnp.float32)
        if self.total_anneal_steps > 0:
            return jnp.minimum(self.anneal_cap,
                               step / self.total_anneal_steps)
        return jnp.float32(self.anneal_cap)

    def _critic(self, params, actor_loss, aux):
        feats = jnp.stack([aux["seen"], aux["unseen"], actor_loss], axis=1)
        # reference BatchNorm1d(3): batch statistics (torch train mode),
        # sqrt(var + eps) denominator, trainable affine
        mean = jnp.mean(feats, 0, keepdims=True)
        var = jnp.var(feats, 0, keepdims=True)
        feats = (feats - mean) / jnp.sqrt(var + 1e-5)
        feats = feats * params["critic_bn_g"] + params["critic_bn_b"]
        y = self._mlp(params["critic"], feats, act=jax.nn.relu)
        return jax.nn.sigmoid(y[:, 0])

    def _ndcg(self, aux):
        k = min(self.metrics_k, self.n_items)
        pred = jnp.where(aux["input"] != 0, -jnp.inf, aux["pred"])
        _, idx = jax.lax.top_k(pred, k)
        topk_true = jnp.take_along_axis(aux["true"], idx, axis=1)
        tp = 1.0 / jnp.log2(jnp.arange(2.0, k + 2.0))
        dcg = jnp.sum(topk_true * tp[None, :], axis=1)
        n_pos = jnp.sum((aux["true"] > 0).astype(jnp.int32), axis=1)
        icum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(tp)])
        idcg = icum[jnp.clip(n_pos, 0, k)]
        return dcg / jnp.maximum(idcg, 0.1)

    def calculate_loss(self, params, batch, rng=None):
        user = batch[self.USER_ID]
        x = self._rating_matrix(user)
        w = batch.get("_weight")
        w = jnp.ones(x.shape[0]) if w is None else w
        wn = jnp.maximum(jnp.sum(w), 1.0)
        sg = jax.lax.stop_gradient

        if self.train_stage == "actor_pretrain":
            _, ce, kl, _ = self._actor(params, x, rng)
            return jnp.sum((ce + self._anneal(batch) * kl) * w) / wn
        if self.train_stage == "critic_pretrain":
            actor_p = sg({"encoder": params["encoder"],
                          "decoder": params["decoder"]})
            _, ce, kl, aux = self._actor({**params, **actor_p}, x, rng)
            actor_loss = sg(ce + self._anneal(batch) * kl)
            aux = sg(aux)
            y = self._critic(params, actor_loss, aux)
            score = sg(self._ndcg(aux))
            return jnp.sum(jnp.square(y - score) * w) / wn
        # finetune: maximize the (frozen) critic's score of the actor loss
        _, ce, kl, aux = self._actor(params, x, rng)
        actor_loss = ce + self._anneal(batch) * kl
        critic_p = {"critic": sg(params["critic"]),
                    "critic_bn_g": sg(params["critic_bn_g"]),
                    "critic_bn_b": sg(params["critic_bn_b"])}
        y = self._critic({**params, **critic_p}, actor_loss, aux)
        return jnp.sum(-y * w) / wn

    def full_sort_predict(self, params, batch):
        x = self._rating_matrix(batch[self.USER_ID])
        logits, _, _, _ = self._actor(params, x, None)
        return logits

    def predict(self, params, batch):
        scores = self.full_sort_predict(params, batch)
        return jnp.take_along_axis(scores, batch[self.ITEM_ID][:, None], 1)[:, 0]
