"""Prototype: grouped-dense attention vs the production XLA bf16 path.

Round-5 trace finding (profile_op_breakdown at SASRec ml-1m shape): ~36%
of the train step is layout copies on the (B, H, L, L) score tensors —
XLA lays out the tiny per-sequence 50x50 batched matmuls batch-minor
(T(2,128)) and pays ~8 copies/step converting to standard layouts.

Idea: fold g sequences into ONE dense (g*L, g*L) score matmul with a
block-diagonal causal mask. g*L = 200-400 rows/lanes makes the matmul fat
enough for standard T(8,128) layouts (no copies); the MXU does g x the
(trivial) flops; cross-sequence entries are masked to -1e9 and die in the
softmax.

Usage: python scripts/bench_grouped_attn.py [B] [L] [D] [H] [I]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = 50
BF16 = jnp.bfloat16


def grouped_attention(q, k, v, key_valid, g, n_heads, attn_dropout=0.0,
                      rng=None):
    """q/k/v: (B, L, H, hd) bf16; key_valid: (B, L). Returns (B, L, H*hd).

    Scores for g sequences ride one (gL, gL) dense matmul per (B/g, h)."""
    B, L, H, hd = q.shape
    GL = g * L
    qg = q.reshape(B // g, GL, H, hd)
    kg = k.reshape(B // g, GL, H, hd)
    vg = v.reshape(B // g, GL, H, hd)
    # block-diagonal causal mask, (GL, GL) const
    pos = jnp.arange(GL)
    same = (pos[:, None] // L) == (pos[None, :] // L)
    causal = (pos[:, None] % L) >= (pos[None, :] % L)
    base = jnp.where(same & causal, 0.0, -1e9)                 # (GL, GL)
    kv = key_valid.reshape(B // g, GL)
    mask = base[None, None] + jnp.where(kv > 0, 0.0, -1e9)[:, None, None, :]
    scores = jnp.einsum("blhd,bmhd->bhlm", qg, kg,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    probs = jax.nn.softmax(scores + mask, axis=-1)
    if attn_dropout > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - attn_dropout, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - attn_dropout), 0.0)
    ctx = jnp.einsum("bhlm,bmhd->blhd", probs.astype(BF16), vg,
                     preferred_element_type=jnp.float32)
    return ctx.reshape(B, L, H * hd)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    D = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    H = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    I = int(sys.argv[5]) if len(sys.argv) > 5 else 256

    from recbole_tpu.models.layers import (transformer_init,
                                           transformer_apply, layer_norm,
                                           dropout_apply, activation, dot_c)

    rng = jax.random.key(0, impl="rbg")
    k1, k2, k3 = jax.random.split(rng, 3)
    params = transformer_init(k1, 1, H, D, I)
    x = jax.random.normal(k2, (B, L, D), jnp.float32) * 0.5
    lens = jax.random.randint(k3, (B,), 1, L + 1, jnp.int32)
    key_valid = (jnp.arange(L)[None, :] < lens[:, None]).astype(jnp.int32)
    hd = D // H

    def layer_grouped(p, x, g, rng=None, dropout=0.0, attn_dropout=0.0):
        layer = p[0]
        fn = activation("gelu")

        def proj(w, b):
            return (dot_c(x, w, BF16) + b).reshape(B, L, H, hd).astype(BF16)

        if rng is not None:
            rng, ka, k1_, k2_ = jax.random.split(rng, 4)
        else:
            ka = k1_ = k2_ = None
        ctx = grouped_attention(proj(layer["wq"], layer["bq"]),
                                proj(layer["wk"], layer["bk"]),
                                proj(layer["wv"], layer["bv"]),
                                key_valid, g, H, attn_dropout, ka)
        attn_out = dot_c(ctx, layer["wo"], BF16) + layer["bo"]
        if dropout > 0.0 and rng is not None:
            attn_out = dropout_apply(k1_, attn_out, dropout)
        x = layer_norm(x + attn_out, layer["ln1_g"], layer["ln1_b"])
        h_in = (dot_c(x, layer["ff1_w"], BF16) + layer["ff1_b"]).astype(BF16)
        h = fn(h_in)
        h = dot_c(h, layer["ff2_w"], BF16) + layer["ff2_b"]
        if dropout > 0.0 and rng is not None:
            h = dropout_apply(k2_, h, dropout)
        return layer_norm(x + h, layer["ln2_g"], layer["ln2_b"])

    def xla_fwd(p, x, rng=None, dr=0.0, adr=0.0):
        return transformer_apply(p, x, None, H, act="gelu",
                                 dropout=dr, attn_dropout=adr, rng=rng,
                                 compute_dtype=BF16,
                                 mask_spec=(key_valid, True))

    # correctness vs baseline (no dropout)
    y_ref = jax.jit(lambda p, x: xla_fwd(p, x))(params, x)
    for g in (2, 4, 8):
        y_g = jax.jit(lambda p, x, g=g: layer_grouped(p, x, g))(params, x)
        err = float(jnp.max(jnp.abs(y_ref - y_g))
                    / (jnp.max(jnp.abs(y_ref)) + 1e-9))
        print(f"g={g} fwd rel-max err vs XLA-bf16: {err:.2e}")

    def chain(fn):
        @jax.jit
        def run(params, x):
            def body(i, acc):
                return acc + fn(params, x + acc * 1e-9)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
        return run

    def time_it(label, fn):
        run = chain(fn)
        run(params, x).block_until_ready()
        t0 = time.perf_counter()
        run(params, x).block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{label:40s} {dt:7.3f} ms/layer")

    dkey = jax.random.key(7, impl="rbg")
    cases = [
        ("XLA baseline grad (dropout .5/.5)",
         lambda p, x: jax.grad(lambda p_, x_: jnp.sum(jnp.tanh(
             xla_fwd(p_, x_, dkey, 0.5, 0.5))), argnums=1)(p, x).sum()),
    ]
    for g in (2, 4, 8):
        cases.append((f"grouped g={g} grad (dropout .5/.5)",
                      lambda p, x, g=g: jax.grad(
                          lambda p_, x_: jnp.sum(jnp.tanh(layer_grouped(
                              p_, x_, g, dkey, 0.5, 0.5))),
                          argnums=1)(p, x).sum()))
        cases.append((f"grouped g={g} fwd (no dropout)",
                      lambda p, x, g=g: jnp.sum(layer_grouped(p, x, g))))
    for label, f in cases:
        time_it(label, f)


if __name__ == "__main__":
    main()
