"""Micro-benchmark: embedding-gradient strategies at sequential-family shape.

The hypothesis (round 4): the (B*L ~ 100K row) input-embedding scatter-add
into the small (V ~ 3.7K, 64) table row-serializes on TPU and dominates the
SASRec/GRU4Rec step. Compares, at ml-1m SASRec shape:

  scatter   plain gather fwd + XLA scatter-add bwd (the status quo)
  segsum    take_rows: sort + sorted segment-sum bwd (the CTR lever)
  onehot    take_rows_dense_grad: Pallas one-hot MXU matmul bwd
  onehotX   same, XLA chunked-scan fallback

Chained-loop timing per the axon rules: consts on device, roll the small
operand, consume the full output, subtract the 1.3ms/iter floor.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V, D = 3707, 64
B, L = 2048, 50
ITERS = 30


def timed(name, step_fn, *args):
    out = step_fn(*args)
    jax.tree.map(lambda a: np.asarray(a), out)       # warm + compile
    t0 = time.time()
    out = step_fn(*args)
    s = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.time() - t0) / ITERS * 1e3
    print(f"{name:<10} {dt:8.3f} ms/iter   (sink {s:.3e})", flush=True)
    return dt


def make_step(bwd):
    """One grad-of-gather iteration, chained ITERS times in-jit."""

    def gather(table, ids):
        if bwd == "scatter":
            return table[ids]
        if bwd == "segsum":
            from recbole_tpu.ops.bitgraph import take_rows
            return take_rows(V, table, ids)
        from recbole_tpu.ops.embed_grad import take_rows_dense_grad
        return take_rows_dense_grad(V, table, ids)

    @jax.jit
    def step(table, ids, w):
        def body(i, carry):
            t, acc = carry
            idr = jnp.roll(ids, i, axis=0)

            def loss(tt):
                e = gather(tt, idr).astype(jnp.bfloat16)
                return jnp.sum((e * w).astype(jnp.float32))

            g = jax.grad(loss)(t)
            return t, acc + jnp.max(jnp.abs(g))

        _, acc = jax.lax.fori_loop(0, ITERS, body, (table, jnp.float32(0)))
        return acc

    return step


def make_xla_only_step():
    from recbole_tpu.ops.embed_grad import onehot_matmul_grad_xla

    @jax.jit
    def step(table, ids, w):
        def body(i, acc):
            idr = jnp.roll(ids, i, axis=0).reshape(-1)
            g = onehot_matmul_grad_xla(idr, w.reshape(-1, D), V)
            return acc + jnp.max(jnp.abs(g))

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    return step


def bench_ctr_windowed():
    """Large-vocab dense-grad strategies at Criteo shape: XLA scatter vs
    the windowed VMEM sweep (ops/embed_grad.windowed_grad)."""
    from recbole_tpu.ops.embed_grad import windowed_grad

    Vc, Dc, F = 2_572_192, 10, 26
    key = jax.random.key(5, impl="rbg")
    k1, k2, _ = jax.random.split(key, 3)
    ids = jax.random.randint(k1, (2048 * F,), 0, Vc, jnp.int32)
    g = jax.random.normal(k2, (2048 * F, Dc), jnp.float32)

    def chain(fn):
        @jax.jit
        def run(ids, g):
            def body(i, acc):
                out = fn(jnp.roll(ids, i), g)
                return acc + jnp.max(jnp.abs(out))
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
        return run

    # Criteo's field structure for the grouped strategy
    from recbole_tpu.ops.embed_grad import grouped_take_rows
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_ctr
    vocabs = bench_ctr.SHAPES["criteo"]["vocabs"]
    offs, total = [], 0
    for v in vocabs:
        offs.append(total)
        total += v
    spec = tuple(zip(offs, vocabs))
    kf = jax.random.key(9, impl="rbg")
    fids = jnp.stack([jax.random.randint(jax.random.fold_in(kf, j),
                                         (2048,), 0, v, jnp.int32) + o
                      for j, (o, v) in enumerate(spec)], axis=1)  # (B, F)
    table = jax.random.normal(jax.random.fold_in(kf, 99),
                              (total, Dc), jnp.float32) * 0.01
    gw = jax.random.normal(jax.random.fold_in(kf, 100),
                           (2048, len(vocabs), Dc), jnp.float32)

    @jax.jit
    def run_grouped(table, fids, gw):
        def body(i, acc):
            idr = jnp.roll(fids, i, axis=0)

            def loss(t):
                return jnp.sum(grouped_take_rows(spec, t, idr) * gw)

            return acc + jnp.max(jnp.abs(jax.grad(loss)(table)))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    try:
        s = float(np.asarray(run_grouped(table, fids, gw)))
        t0 = time.time()
        s = float(np.asarray(run_grouped(table, fids, gw)))
        dt = (time.time() - t0) / ITERS * 1e3
        print(f"{'ctr-grouped':<13} {dt:8.3f} ms/iter (sink {s:.3e})",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{'ctr-grouped':<13} FAILED: {str(e)[:150]}", flush=True)

    for name, fn in [
        ("ctr-scatter", lambda i, v: jnp.zeros((Vc, Dc), jnp.float32)
            .at[i].add(v)),
        ("ctr-windowed", lambda i, v: windowed_grad(i, v, Vc)),
        ("ctr-sortonly", lambda i, v: v[jnp.argsort(i)]),
    ]:
        try:
            run = chain(fn)
            s = float(np.asarray(run(ids, g)))
            t0 = time.time()
            s = float(np.asarray(run(ids, g)))
            dt = (time.time() - t0) / ITERS * 1e3
            print(f"{name:<13} {dt:8.3f} ms/iter (sink {s:.3e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<13} FAILED: {str(e)[:150]}", flush=True)


def main():
    key = jax.random.key(0, impl="rbg")
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (V, D), jnp.float32)
    ids = jax.random.randint(k2, (B, L), 0, V, jnp.int32)
    w = jax.random.normal(k3, (B, L, D), jnp.bfloat16)
    base = timed("roll-floor", jax.jit(lambda t, i, w: jax.lax.fori_loop(
        0, ITERS, lambda j, a: a + jnp.float32(jnp.max(jnp.roll(i, j, 0))),
        jnp.float32(0))), table, ids, w)
    for name in ("scatter", "segsum", "onehot"):
        timed(name, make_step(name), table, ids, w)
    timed("onehotX", make_xla_only_step(), table, ids, w)
    print(f"(subtract the {base:.2f} ms roll floor from each)")
    bench_ctr_windowed()


if __name__ == "__main__":
    main()
