"""Decompose the Criteo FM/DeepFM train step: embedding gather/scatter vs
towers vs optimizer. Chained-loop timings at the reference's Criteo shape.

Usage: python scripts/bench_ctr_anatomy.py [FM|DeepFM]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

V = 2_572_192          # Criteo unified vocab
F = 26                 # token fields
NF = 13                # float fields
D = 10
B = 2048
ITERS = 30


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "DeepFM"
    key = jax.random.key(0, impl="rbg")
    k1, k2, k3, k4 = jax.random.split(key, 4)
    table = jax.random.normal(k1, (V, D), jnp.float32) * 0.01
    bias = jnp.zeros((V,), jnp.float32)
    ids = jax.random.randint(k2, (B, F), 0, V, jnp.int32)
    floats = jax.random.normal(k3, (B, NF), jnp.float32)
    label = (jax.random.uniform(k4, (B,)) < 0.25).astype(jnp.float32)
    femb = jax.random.normal(k4, (NF, D), jnp.float32) * 0.01
    tx = optax.adam(1e-3)

    def chain(body, *extra):
        @jax.jit
        def run(table, bias, femb, ids):
            def f(i, carry):
                t, b, fe, acc = carry
                idr = jnp.roll(ids, i, axis=0)
                x = body(t, b, fe, idr)
                return t, b, fe, acc + x
            _, _, _, acc = jax.lax.fori_loop(
                0, ITERS, f, (table, bias, femb, jnp.float32(0)))
            return acc
        return run

    def fm_logit(t, b, fe, idr):
        emb = t[idr]                                     # (B, F, D)
        femb_x = fe[None, :, :] * floats[:, :, None]     # (B, NF, D)
        allemb = jnp.concatenate([emb, femb_x], axis=1)
        s = jnp.sum(allemb, axis=1)
        pair = 0.5 * jnp.sum(s * s - jnp.sum(allemb * allemb, 1), -1)
        first = jnp.sum(b[idr], 1) + jnp.sum(floats, 1)
        return first + pair

    def loss(t, b, fe, idr):
        logit = fm_logit(t, b, fe, idr)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logit, label))

    cases = {}

    def case_loss(t, b, fe, idr):
        return loss(t, b, fe, idr)

    def case_grad(t, b, fe, idr):
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(t, b, fe, idr)
        return l + jnp.max(jnp.abs(g[0][0])) + jnp.max(jnp.abs(g[1]))

    def case_gather_only(t, b, fe, idr):
        return jnp.max(jnp.abs(t[idr])).astype(jnp.float32)

    def case_gather_grad(t, b, fe, idr):
        def f(tt):
            return jnp.sum(tt[idr] * 1e-3)
        g = jax.grad(f)(t)
        return jnp.max(jnp.abs(g))

    def case_adam_table(t, b, fe, idr):
        # one dense adam update over the (V, D) table alone
        st = tx.init(t)
        g = jnp.zeros_like(t).at[idr[:, 0]].add(1e-3)
        up, _ = tx.update(g, st, t)
        return jnp.max(jnp.abs(up))

    cases = {"loss": case_loss, "grad": case_grad,
             "gather": case_gather_only, "gather-grad": case_gather_grad}
    for name, body in cases.items():
        run = chain(body)
        try:
            s = float(np.asarray(run(table, bias, femb, ids)))
            t0 = time.time()
            s = float(np.asarray(run(table, bias, femb, ids)))
            dt = (time.time() - t0) / ITERS * 1e3
            print(f"{name:<12} {dt:8.3f} ms/iter (sink {s:.3e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<12} FAILED: {str(e)[:150]}", flush=True)

    # dense adam over the full table, once per iter (the moment sweep)
    st = tx.init({"t": table})

    @jax.jit
    def adam_sweep(table, ids):
        def f(i, carry):
            t, s, acc = carry
            g = {"t": jnp.zeros_like(t).at[jnp.roll(ids, i, 0)].add(1e-3)}
            up, s = tx.update(g, s, {"t": t})
            t = optax.apply_updates({"t": t}, up)["t"]
            return t, s, acc + jnp.max(jnp.abs(t))
        _, _, acc = jax.lax.fori_loop(0, ITERS, f,
                                      (table, st, jnp.float32(0)))
        return acc

    t0 = time.time()
    s = float(np.asarray(adam_sweep(table, ids)))
    t0 = time.time()
    s = float(np.asarray(adam_sweep(table, ids)))
    print(f"{'adam-sweep':<12} {(time.time() - t0) / ITERS * 1e3:8.3f} "
          f"ms/iter (sink {s:.3e})", flush=True)


if __name__ == "__main__":
    main()
