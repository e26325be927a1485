"""Decompose the SASRec train step at ml-1m shape: which part owns the
~11.7 ms? Chained-loop timings (axon rules) of nested ablations:

  step        full grad step incl. adam update
  grad        value_and_grad of the loss (no optimizer)
  loss        forward + CE loss, no grad
  fwd         transformer forward only
  fwd-nodrop  forward without dropout
  grad-nodrop grad without dropout
  grad-plain  grad with plain-gather input embedding (scatter backward)
  ce          CE logits + loss on a fixed (B, D) output

Usage: python scripts/bench_seq_anatomy.py [B] [L]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

N_ITEMS = 3707
ITERS = 30


class _Info:
    user_num = 6041
    item_num = N_ITEMS


def main():
    if os.environ.get("RECBOLE_ANATOMY_CPU"):
        jax.config.update("jax_platforms", "cpu")
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    from recbole_tpu.config.configurator import Config
    from recbole_tpu.models import get_model

    cfg = Config("SASRec", "synthetic", config_dict={
        "MAX_ITEM_LIST_LENGTH": L}, _parse_cmd_line=False)
    model = get_model("SASRec")(cfg, _Info())
    params = model.zero_pad_rows(model.init_params(
        jax.random.key(0, impl="rbg")))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    key = jax.random.key(1, impl="rbg")
    ks, kl, kp = jax.random.split(key, 3)
    seq = jax.random.randint(ks, (B, L), 1, N_ITEMS, jnp.int32)
    slen = jnp.full((B,), L, jnp.int32)
    pos = jax.random.randint(kp, (B,), 1, N_ITEMS, jnp.int32)

    def batch_of(s):
        return {model.ITEM_SEQ: s, model.ITEM_SEQ_LEN: slen,
                model.POS_ITEM_ID: pos, model.ITEM_ID: pos}

    def chain(body):
        @jax.jit
        def run(params, opt_state, seq, rng):
            def f(i, carry):
                p, o, r, acc = carry
                s = jnp.roll(seq, i, axis=0)
                p, o, r, x = body(p, o, r, s)
                return p, o, r, acc + x
            p, o, r, acc = jax.lax.fori_loop(
                0, ITERS, f, (params, opt_state, rng, jnp.float32(0)))
            return acc
        return run

    def loss_fn(p, s, rng):
        return model.calculate_loss(p, batch_of(s), rng)

    def loss_nodrop(p, s, rng):
        return model.calculate_loss(p, batch_of(s), None)

    def mk_cases():
        def step(p, o, r, s):
            r, k = jax.random.split(r)
            l, g = jax.value_and_grad(loss_fn)(p, s, k)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, r, l

        def grad(p, o, r, s):
            r, k = jax.random.split(r)
            l, g = jax.value_and_grad(loss_fn)(p, s, k)
            return p, o, r, l + jnp.max(jnp.abs(g["item_embedding"]))

        def loss_only(p, o, r, s):
            r, k = jax.random.split(r)
            return p, o, r, loss_fn(p, s, k)

        def fwd(p, o, r, s):
            r, k = jax.random.split(r)
            out = model.forward(p, batch_of(s), k)
            return p, o, r, jnp.max(jnp.abs(out)).astype(jnp.float32)

        def fwd_nodrop(p, o, r, s):
            out = model.forward(p, batch_of(s), None)
            return p, o, r, jnp.max(jnp.abs(out)).astype(jnp.float32)

        def grad_nodrop(p, o, r, s):
            l, g = jax.value_and_grad(loss_nodrop)(p, s, None)
            return p, o, r, l + jnp.max(jnp.abs(g["item_embedding"]))

        def ce(p, o, r, s):
            out = p["item_embedding"][s[:, 0]]          # (B, D) stand-in
            from recbole_tpu.models.layers import dot_c
            from recbole_tpu.models.losses import ce_loss
            logits = dot_c(out, p["item_embedding"].T, model.cdt)
            return p, o, r, ce_loss(logits, pos, None)

        return {"step": step, "grad": grad, "loss": loss_only, "fwd": fwd,
                "fwd-nodrop": fwd_nodrop, "grad-nodrop": grad_nodrop,
                "ce": ce}

    results = {}
    for name, body in mk_cases().items():
        run = chain(body)
        try:
            s = float(np.asarray(run(params, opt_state, seq,
                                     jax.random.key(2, impl="rbg"))))
            t0 = time.time()
            s = float(np.asarray(run(params, opt_state, seq,
                                     jax.random.key(2, impl="rbg"))))
            dt = (time.time() - t0) / ITERS * 1e3
            results[name] = dt
            print(f"{name:<12} {dt:8.3f} ms/iter (sink {s:.3e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<12} FAILED: {str(e)[:150]}", flush=True)

    # fused Pallas attention variant (dropout + both attn matmuls in one
    # kernel; (B,H,L,L) never reaches HBM) — gate was "tpu"-only until r4,
    # so this path was unreachable on axon and never measured here
    cfg_f = Config("SASRec", "synthetic", config_dict={
        "MAX_ITEM_LIST_LENGTH": L, "fused_attention": True},
        _parse_cmd_line=False)
    model_f = get_model("SASRec")(cfg_f, _Info())

    def loss_fused(p, s, rng):
        return model_f.calculate_loss(p, batch_of(s), rng)

    def grad_fused(p, o, r, s):
        r, k = jax.random.split(r)
        l, g = jax.value_and_grad(loss_fused)(p, s, k)
        return p, o, r, l + jnp.max(jnp.abs(g["item_embedding"]))

    def fwd_fused(p, o, r, s):
        r, k = jax.random.split(r)
        out = model_f.forward(p, batch_of(s), k)
        return p, o, r, jnp.max(jnp.abs(out)).astype(jnp.float32)

    for name, body in [("fwd-fattn", fwd_fused), ("grad-fattn", grad_fused)]:
        run = chain(body)
        try:
            s = float(np.asarray(run(params, opt_state, seq,
                                     jax.random.key(2, impl="rbg"))))
            t0 = time.time()
            s = float(np.asarray(run(params, opt_state, seq,
                                     jax.random.key(2, impl="rbg"))))
            print(f"{name:<12} {(time.time() - t0) / ITERS * 1e3:8.3f} "
                  f"ms/iter (sink {s:.3e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<12} FAILED: {str(e)[:150]}", flush=True)

    # plain-gather variant: monkeypatch embed_seq to the raw gather
    from recbole_tpu.models.base import SequentialRecommender
    orig = SequentialRecommender.embed_seq
    SequentialRecommender.embed_seq = \
        lambda self, p, ids, key="item_embedding": p[key][ids]
    try:
        run = chain(mk_cases()["grad"])
        s = float(np.asarray(run(params, opt_state, seq,
                                 jax.random.key(2, impl="rbg"))))
        t0 = time.time()
        s = float(np.asarray(run(params, opt_state, seq,
                                 jax.random.key(2, impl="rbg"))))
        print(f"{'grad-plain':<12} {(time.time() - t0) / ITERS * 1e3:8.3f} "
              f"ms/iter (sink {s:.3e})", flush=True)
    finally:
        SequentialRecommender.embed_seq = orig


if __name__ == "__main__":
    main()
