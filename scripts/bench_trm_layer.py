"""Correctness + micro-bench for ops/trm_layer.py (round-5 masked-head
bf16 whole-layer transformer kernel) vs the XLA bf16 path and the round-4
lane-slice kernel.

Per-layer forward and value_and_grad timings at SASRec ml-1m shape
(B=2048 L=50 D=64 H=2 I=256), chained fori_loop protocol (axon rules).

Usage: python scripts/bench_trm_layer.py [B] [L] [D] [H] [I]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    D = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    H = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    I = int(sys.argv[5]) if len(sys.argv) > 5 else 256

    from recbole_tpu.models.layers import transformer_init, transformer_apply
    from recbole_tpu.ops.trm_layer import (fused_transformer_layer2,
                                           fused_layer2_supported)

    rng = jax.random.key(0, impl="rbg")
    k1, k2, k3 = jax.random.split(rng, 3)
    params = transformer_init(k1, 1, H, D, I)
    x = jax.random.normal(k2, (B, L, D), jnp.float32) * 0.5
    lens = jax.random.randint(k3, (B,), 1, L + 1, jnp.int32)
    key_valid = (jnp.arange(L)[None, :] < lens[:, None]).astype(jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)

    assert fused_layer2_supported(B, H, L, D, I, "gelu"), "unsupported shape"

    # ---------------------------------------------------------- correctness
    def xla_fwd(params, x):
        return transformer_apply(params, x, None, H, act="gelu",
                                 compute_dtype=jnp.bfloat16,
                                 mask_spec=(key_valid, True))

    def ker_fwd(params, x):
        return fused_transformer_layer2(
            x, params[0], key_valid, seed, n_heads=H, causal=True)

    y_ref = jax.jit(xla_fwd)(params, x)
    y_ker = jax.jit(ker_fwd)(params, x)
    err = jnp.max(jnp.abs(y_ref - y_ker)) / (jnp.max(jnp.abs(y_ref)) + 1e-9)
    print(f"fwd rel-max err vs XLA-bf16: {float(err):.2e}")

    def loss_x(p, x):
        return jnp.sum(jnp.tanh(xla_fwd(p, x)))

    def loss_k(p, x):
        return jnp.sum(jnp.tanh(ker_fwd(p, x)))

    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(params, x)
    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1)))(params, x)
    flat_x, _ = jax.tree_util.tree_flatten(gx)
    flat_k, _ = jax.tree_util.tree_flatten(gk)
    gscale = max(float(jnp.max(jnp.abs(a))) for a in flat_x)
    worst = 0.0
    for a, b in zip(flat_x, flat_k):
        # floor the denominator at 1% of the global scale: leaves whose true
        # gradient is ~0 (e.g. bk — softmax is near-invariant to a key bias)
        # make pure relative error meaningless
        scale = max(float(jnp.max(jnp.abs(a))), 1e-2 * gscale)
        worst = max(worst, float(jnp.max(jnp.abs(a - b))) / scale)
    print(f"grad rel-max err vs XLA-bf16: {worst:.2e}")

    # --------------------------------------------------------------- timing
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
        print(f"{label:34s} {dt:7.3f} ms/layer")
        return dt

    dkey = jax.random.key(7, impl="rbg")

    def xla_fwd_drop(p, x):
        return transformer_apply(p, x, None, H, act="gelu",
                                 dropout=0.5, attn_dropout=0.5, rng=dkey,
                                 compute_dtype=jnp.bfloat16,
                                 mask_spec=(key_valid, True))

    def ker_fwd_drop(p, x):
        return fused_transformer_layer2(
            x, p[0], key_valid, seed + 1, n_heads=H, causal=True,
            dropout=0.5, attn_dropout=0.5)

    for label, f in [
        ("XLA bf16 fwd (no dropout)", lambda p, x: jnp.sum(xla_fwd(p, x))),
        ("kernel fwd (no dropout)", lambda p, x: jnp.sum(ker_fwd(p, x))),
        ("XLA bf16 fwd (dropout .5/.5)",
         lambda p, x: jnp.sum(xla_fwd_drop(p, x))),
        ("kernel fwd (dropout .5/.5)",
         lambda p, x: jnp.sum(ker_fwd_drop(p, x))),
        ("XLA bf16 grad (no dropout)",
         lambda p, x: loss_x(p, x)
         if False else jax.grad(loss_x, argnums=1)(p, x).sum()),
        ("kernel grad (no dropout)",
         lambda p, x: jax.grad(loss_k, argnums=1)(p, x).sum()),
        ("XLA bf16 grad (dropout .5/.5)",
         lambda p, x: jax.grad(
             lambda p_, x_: jnp.sum(jnp.tanh(xla_fwd_drop(p_, x_))),
             argnums=1)(p, x).sum()),
        ("kernel grad (dropout .5/.5)",
         lambda p, x: jax.grad(
             lambda p_, x_: jnp.sum(jnp.tanh(ker_fwd_drop(p_, x_))),
             argnums=1)(p, x).sum()),
    ]:
        time_it(label, f)

    # round-4 kernel for reference, if the shape is supported
    try:
        from recbole_tpu.ops.fused_transformer import (
            fused_transformer_layer, fused_layer_supported)
        if fused_layer_supported(B, H, L, D, I, "gelu"):
            def ker1(p, x):
                return fused_transformer_layer(
                    x, p[0], key_valid, seed, n_heads=H, causal=True)
            time_it("round-4 kernel fwd (no dropout)",
                    lambda p, x: jnp.sum(ker1(p, x)))
            time_it("round-4 kernel grad (no dropout)",
                    lambda p, x: jax.grad(
                        lambda p_, x_: jnp.sum(jnp.tanh(ker1(p_, x_))),
                        argnums=1)(p, x).sum())
    except Exception as e:  # noqa: BLE001
        print(f"round-4 kernel skipped: {e}")


if __name__ == "__main__":
    main()
