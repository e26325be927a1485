"""TPU timing: Pallas shift-plane bit kernels vs the XLA unpack path, at
Yelp restricted-step shapes, plus a full restricted-LightGCN-step re-time.

Run serialized (one TPU process). Usage:
    python scripts/bench_bit_kernels.py [micro] [step]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_USERS, N_ITEMS = 102_046, 98_408
D = 64
R = 4096
ITERS = 20


def micro():
    from recbole_tpu.ops.bitgraph import _unpack_bits, _pad_k
    from recbole_tpu.ops.bit_kernels import (
        bit_rows_matmul, bit_cols_matmul, perm_planes, unperm_planes)

    nbytes = -(-(-(-N_ITEMS // 8)) // 256) * 256
    key = jax.random.key(0, impl="rbg")
    k1, k2, k3 = jax.random.split(key, 3)
    packed = jax.random.randint(k1, (R, nbytes), 0, 256, jnp.int32) \
        .astype(jnp.uint8)
    v = jax.random.normal(k2, (nbytes * 8, D), jnp.bfloat16)
    g = jax.random.normal(k3, (R, D), jnp.bfloat16)
    vp = jax.device_put(perm_planes(v))

    def chain(fn):
        @jax.jit
        def run(packed, v, g):
            def body(i, acc):
                out = fn(packed, v, jnp.roll(g, i, axis=0))
                return acc + jnp.max(jnp.abs(out))
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))
        return run

    cases = {
        "rows_pallas": chain(lambda p, v, g: bit_rows_matmul(p, vp)),
        "rows_xla": chain(lambda p, v, g: jnp.dot(
            _unpack_bits(p), v, preferred_element_type=jnp.float32)),
        "cols_pallas": chain(lambda p, v, g: unperm_planes(
            bit_cols_matmul(p, g))),
        "cols_xla": chain(lambda p, v, g: jax.lax.dot_general(
            _unpack_bits(p), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)),
    }
    for name, run in cases.items():
        try:
            s = float(np.asarray(run(packed, v, g)))   # compile+warm
            t0 = time.time()
            s = float(np.asarray(run(packed, v, g)))
            dt = (time.time() - t0) / ITERS * 1e3
            print(f"{name:<12} {dt:8.3f} ms/op  (sink {s:.3e})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:<12} FAILED: {str(e)[:200]}", flush=True)


def step():
    """Full restricted LightGCN step at Yelp scale with the kernels wired
    in (same protocol as bench_graph_prop's 'fullstep')."""
    import scipy.sparse as sp
    from recbole_tpu.ops.graph import BipartiteProp
    from recbole_tpu.ops.bitgraph import BitRestrictedGraph, LinearPropBatch
    from recbole_tpu.models.losses import bpr_loss

    rng = np.random.RandomState(0)
    E = 2_902_488
    u = rng.randint(0, N_USERS, E).astype(np.int32)
    i = rng.randint(0, N_ITEMS, E).astype(np.int32)
    inter = sp.csr_matrix((np.ones(E, np.float32), (u, i)),
                          shape=(N_USERS, N_ITEMS))
    prop = BipartiteProp(inter, N_USERS, N_ITEMS)
    bitg = BitRestrictedGraph(inter, N_USERS, N_ITEMS)
    lpb = LinearPropBatch(prop, N_USERS, N_ITEMS, n_layers=2)
    consts = {**prop.init_consts(), **bitg.init_consts()}
    # axon rule: never upload GBs through the tunnel — regenerate the big
    # consts ON-DEVICE at identical shapes (timing is value-oblivious; the
    # round-3 worker crash was exactly this upload)
    key = jax.random.key(7, impl="rbg")
    regen = {}
    for name, v in consts.items():
        if v.nbytes < 16 << 20:
            continue
        key, k = jax.random.split(key)
        if v.dtype == jnp.uint8:
            regen[name] = jax.random.randint(k, v.shape, 0, 256,
                                             jnp.int32).astype(jnp.uint8)
        elif v.dtype in (jnp.int32, jnp.int64):
            hi = max(int(np.asarray(v).max()), 1)
            regen[name] = jax.random.randint(k, v.shape, 0, hi + 1, v.dtype)
        else:
            regen[name] = (jax.random.normal(k, v.shape) * 0.01) \
                .astype(v.dtype)
    consts = {k_: regen.get(k_, jnp.asarray(v)) for k_, v in consts.items()}

    B = 2048
    key = jax.random.key(0, impl="rbg")
    ku, ki, kb = jax.random.split(key, 3)
    ue = jax.random.normal(ku, (N_USERS, D), jnp.float32) * 0.1
    ie = jax.random.normal(ki, (N_ITEMS, D), jnp.float32) * 0.1

    @jax.jit
    def step_fn(consts, ue, ie, users, pos, neg):
        def loss_fn(ue, ie):
            rows_i = jnp.concatenate([pos, neg])
            e_u, e_i = lpb(consts, ue, ie, users, rows_i)
            ps = jnp.sum(e_u * e_i[:B], -1)
            ns = jnp.sum(e_u * e_i[B:], -1)
            return bpr_loss(ps, ns)

        def body(k, carry):
            ue, ie, acc = carry
            us = (users + k) % N_USERS
            l, (gu, gi) = jax.value_and_grad(loss_fn, argnums=(0, 1))(ue, ie)
            return ue - 1e-3 * gu, ie - 1e-3 * gi, acc + l

        ue, ie, acc = jax.lax.fori_loop(0, ITERS, body, (ue, ie, 0.0))
        return acc

    users = jax.random.randint(kb, (B,), 0, N_USERS, jnp.int32)
    pos = jax.random.randint(kb, (B,), 0, N_ITEMS, jnp.int32)
    neg = jax.random.randint(kb, (B,), 0, N_ITEMS, jnp.int32)
    t0 = time.time()
    s = float(np.asarray(step_fn(consts, ue, ie, users, pos, neg)))
    print(f"  compile+first: {time.time() - t0:.1f}s (sink {s:.3e})",
          flush=True)
    t0 = time.time()
    s = float(np.asarray(step_fn(consts, ue, ie, users, pos, neg)))
    dt = (time.time() - t0) / ITERS * 1e3
    print(f"restricted step w/ pallas bit kernels: {dt:8.2f} ms/step -> "
          f"{dt * (1_326_101 // B + 1) / 1e3:6.1f} s/epoch @2048 (ref 67.9)",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["micro", "step"]
    if "micro" in which:
        micro()
    if "step" in which:
        step()
