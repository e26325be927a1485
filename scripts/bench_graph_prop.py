"""Microbenchmark of bipartite graph-propagation strategies at Yelp shape.

Candidates for the LightGCN/NGCF hot path (102K users / 98K items / 2.9M
interactions = 5.8M directed edges, the scale where the dense-R path exceeds
HBM):

  spmm      current sorted-edge custom-VJP segment-sum (ops/graph.py)
  ell32     degree-bucketed padded neighbor lists, fp32 x (ops/edge_prop.py)
  ell16     same, x gathered in bf16 (fp32 accumulate)
  hub       dense bf16 (n_users, H) matmul over top-H items by degree,
            measured alone to calibrate the hybrid split point
  hybrid    the shipped hub-dense + ELL-tail operator (ops/graph.py)

Each is timed as a 2-layer LightGCN-style propagate under value_and_grad
(the real per-step cost shape). Usage:
  python scripts/bench_graph_prop.py [spmm hybrid ell32 ell16 hub]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N_USERS, N_ITEMS, N_INTER, D = 102_046, 98_408, 2_905_370, 64


def synth_edges(seed=42):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, N_USERS, size=N_INTER).astype(np.int32)
    r = rng.random(N_INTER)
    i = np.floor((N_ITEMS - 1) * r ** 2.2).astype(np.int32)
    # dedup like the real pipeline would (duplicate (u,i) pairs collapse)
    key = u.astype(np.int64) * N_ITEMS + i
    key = np.unique(key)
    u = (key // N_ITEMS).astype(np.int32)
    i = (key % N_ITEMS).astype(np.int32)
    du = np.bincount(u, minlength=N_USERS).astype(np.float32)
    di = np.bincount(i, minlength=N_ITEMS).astype(np.float32)
    w = (1.0 / np.sqrt(np.maximum(du[u], 1.0) * np.maximum(di[i], 1.0))
         ).astype(np.float32)
    return u, i, w


def rand_params(shapes, dtype=jnp.float32):
    """Random params — jnp.ones lets XLA constant-fold entire programs
    (the spmm candidate measured 0.1ms/step with ones, 315ms real)."""
    key = jax.random.PRNGKey(0)
    return {k: (jax.random.normal(jax.random.fold_in(key, n), s) * 0.01
                ).astype(dtype)
            for n, (k, s) in enumerate(shapes.items())}


def _sync(out):
    """jax.block_until_ready is unreliable on the axon remote backend
    (measured returning before execution); fetching a scalar output to host
    is the only trustworthy sync."""
    val = out[0] if isinstance(out, tuple) else out
    float(np.asarray(val))


def time_fn(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        ts.append(time.time() - t0)
    return min(ts)


def loss_through(prop, params):
    """2-layer LightGCN-style propagate; scalar loss so grad covers bwd."""
    x = jnp.concatenate([params["ue"], params["ie"]], axis=0)
    acc = x
    for _ in range(2):
        x = prop(x)
        acc = acc + x
    return jnp.sum(acc ** 2) * 1e-9


def bench_prop(u, i, w, hybrid):
    from recbole_tpu.ops.graph import BipartiteProp
    import scipy.sparse as sp
    mat = sp.csr_matrix((np.ones(len(u), np.float32), (u, i)),
                        shape=(N_USERS, N_ITEMS))
    # force the non-dense path
    prop = BipartiteProp(mat, N_USERS, N_ITEMS, dense_budget=0,
                         hybrid=hybrid)
    if hybrid:
        print(f"  (hub size: {prop.hub_size} items)")
    consts = prop.init_consts()
    params = rand_params({"ue": (N_USERS, D), "ie": (N_ITEMS, D)})

    @jax.jit
    def step(params, consts):
        return jax.value_and_grad(
            lambda p: loss_through(lambda x: prop(consts, x), p))(params)

    return time_fn(step, params, consts)


def bench_ell(u, i, w, dtype):
    from recbole_tpu.ops.edge_prop import build_ell_consts, ell_propagate
    src = np.concatenate([u, i + N_USERS])
    dst = np.concatenate([i + N_USERS, u])
    ew = np.concatenate([w, w])
    # canonical order = head(dst)-sorted for the ELL builder
    order = np.argsort(dst, kind="stable")
    consts, shapes = build_ell_consts(dst[order], src[order],
                                      N_USERS + N_ITEMS)
    att = jnp.asarray(ew[order])
    consts = {k: jnp.asarray(v) for k, v in consts.items()}
    params = rand_params({"ue": (N_USERS, D), "ie": (N_ITEMS, D)}, dtype)

    def prop(consts, x):
        return ell_propagate(shapes, x, att.astype(x.dtype),
                             consts["ellf_eidx"], consts["ellf_nbr"],
                             consts["ellf_inv"], consts["ellb_eidx"],
                             consts["ellb_nbr"], consts["ellb_inv"])

    @jax.jit
    def step(params, consts):
        return jax.value_and_grad(lambda p: loss_through(
            lambda x: prop(consts, x).astype(x.dtype), p))(params)

    return time_fn(step, params, consts)


def bench_hub(u, i, w, H=8192, dtype=jnp.bfloat16):
    """Dense (n_users, H) block alone: the hub half of the hybrid."""
    deg = np.bincount(i, minlength=N_ITEMS)
    hub = np.argsort(-deg)[:H]
    mask = np.isin(i, hub)
    frac = mask.mean()
    remap = np.full(N_ITEMS, -1, np.int64)
    remap[hub] = np.arange(H)
    R = np.zeros((N_USERS, H), np.float32)
    np.add.at(R, (u[mask], remap[i[mask]]), w[mask])
    Rd = jnp.asarray(R, dtype)
    params = rand_params({"ue": (N_USERS, D), "ie": (H, D)})

    def prop(R, xu, xi):
        nu = jnp.dot(R, xi.astype(R.dtype),
                     preferred_element_type=jnp.float32)
        ni = jnp.dot(R.T, xu.astype(R.dtype),
                     preferred_element_type=jnp.float32)
        return nu, ni

    @jax.jit
    def step(params, R):
        def loss(p):
            xu, xi = p["ue"], p["ie"]
            acc = 0.0
            for _ in range(2):
                nu, ni = prop(R, xu, xi)
                xu, xi = nu, ni
                acc = acc + jnp.sum(nu ** 2) + jnp.sum(ni ** 2)
            return acc * 1e-9
        return jax.value_and_grad(loss)(params)

    t = time_fn(step, params, Rd)
    return t, frac


def bench_step(u, i, w, restricted, batch=2048, iters=10):
    """Full LightGCN-style TRAINING STEP at Yelp shape: BPR loss over a
    2048-batch + value_and_grad + SGD-style update, chained ``iters`` times
    inside one jit so the ~27ms axon dispatch round-trip amortizes away and
    nothing can be DCE'd (the update consumes every gradient).

    restricted=True -> ops/bitgraph.py LinearPropBatch (2 full applies);
    False -> classic full propagate + gather (4 full applies)."""
    from recbole_tpu.ops.graph import BipartiteProp
    from recbole_tpu.ops.bitgraph import (BitRestrictedGraph, LinearPropBatch,
                                          take_rows)
    import scipy.sparse as sp
    mat = sp.csr_matrix((np.ones(len(u), np.float32), (u, i)),
                        shape=(N_USERS, N_ITEMS))
    prop = BipartiteProp(mat, N_USERS, N_ITEMS, dense_budget=0)
    consts = dict(prop.init_consts())
    if restricted:
        bg = BitRestrictedGraph(mat, N_USERS, N_ITEMS)
        consts.update(bg.init_consts())
        lpb = LinearPropBatch(prop, N_USERS, N_ITEMS, 2)
    # the axon tunnel uploads at only a few MB/s, so shipping the ~5GB of
    # real consts dominates wall clock; regenerate SHAPE-EQUIVALENT random
    # consts on-device instead (step time depends on shapes/density, not
    # values: matmuls/unpacks are value-oblivious and the ELL gather index
    # distribution is random either way)
    key = jax.random.PRNGKey(7)
    big = {}
    for name, v in consts.items():
        if v.nbytes < 16 << 20:
            continue
        key, k = jax.random.split(key)
        if v.dtype == jnp.uint8:
            big[name] = jax.random.randint(k, v.shape, 0, 256,
                                           jnp.int32).astype(jnp.uint8)
        elif v.dtype in (jnp.int32, jnp.int64):
            hi = max(int(np.asarray(v).max()), 1)
            big[name] = jax.random.randint(k, v.shape, 0, hi + 1, v.dtype)
        else:
            big[name] = (jax.random.normal(k, v.shape) * 0.01).astype(v.dtype)
    consts = {k_: big.get(k_, jnp.asarray(v)) for k_, v in consts.items()}
    params = rand_params({"ue": (N_USERS, D), "ie": (N_ITEMS, D)})
    rng = np.random.RandomState(0)
    bu = jnp.asarray(rng.randint(0, N_USERS, batch).astype(np.int32))
    bp = jnp.asarray(rng.randint(0, N_ITEMS, batch).astype(np.int32))
    bn = jnp.asarray(rng.randint(0, N_ITEMS, batch).astype(np.int32))

    def loss_fn(p, consts, bu, bp, bn):
        if restricted:
            rows_i = jnp.concatenate([bp, bn])
            e_u, e_i = lpb(consts, p["ue"], p["ie"], bu, rows_i)
            pe, ne = e_i[:batch], e_i[batch:]
        else:
            x = jnp.concatenate([p["ue"], p["ie"]], axis=0)
            acc = x
            for _ in range(2):
                x = prop(consts, x)
                acc = acc + x
            final = acc / 3.0
            e_u = final[bu]
            pe = final[N_USERS + bp]
            ne = final[N_USERS + bn]
        scores = jnp.sum(e_u * (pe - ne), axis=-1)
        mf = -jnp.mean(jax.nn.log_sigmoid(scores))
        reg = (jnp.sum(take_rows(N_USERS, p["ue"], bu) ** 2)
               + jnp.sum(take_rows(N_ITEMS, p["ie"], bp) ** 2)
               + jnp.sum(take_rows(N_ITEMS, p["ie"], bn) ** 2)) / batch
        return mf + 1e-5 * reg

    @jax.jit
    def run(params, consts, bu, bp, bn):
        def body(k, carry):
            p, bu, bp, bn = carry
            _, g = jax.value_and_grad(loss_fn)(p, consts, bu, bp, bn)
            p = jax.tree.map(lambda a, b: a - 1e-4 * b, p, g)
            return (p, jnp.roll(bu, 1), jnp.roll(bp, 1), jnp.roll(bn, 1))
        p, *_ = jax.lax.fori_loop(0, iters, body, (params, bu, bp, bn))
        return p["ue"][0, :1]

    t0 = time.time()
    consts = jax.device_put(consts)
    params = jax.device_put(params)
    jax.block_until_ready((consts, params))
    print(f"  consts upload: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    out = run(params, consts, bu, bp, bn)
    _sync(out)
    print(f"  compile+first run: {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = run(params, consts, bu, bp, bn)
        _sync(out)
        ts.append(time.time() - t0)
    return min(ts) / iters


def main():
    try:  # persistent compile cache: reruns skip the multi-minute compiles
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/recbole_tpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 — older jax
        pass
    which = sys.argv[1:] or ["spmm", "hybrid", "ell32", "ell16", "hub"]
    u, i, w = synth_edges()
    print(f"edges (deduped, directed x2): {2 * len(u):,}")
    for name in which:
        if name == "spmm":
            t = bench_prop(u, i, w, hybrid=False)
            print(f"spmm   2-layer fwd+bwd: {t * 1e3:8.1f} ms/step")
        elif name == "hybrid":
            t = bench_prop(u, i, w, hybrid=True)
            print(f"hybrid 2-layer fwd+bwd: {t * 1e3:8.1f} ms/step")
        elif name == "ell32":
            t = bench_ell(u, i, w, jnp.float32)
            print(f"ell32  2-layer fwd+bwd: {t * 1e3:8.1f} ms/step")
        elif name == "ell16":
            t = bench_ell(u, i, w, jnp.bfloat16)
            print(f"ell16  2-layer fwd+bwd: {t * 1e3:8.1f} ms/step")
        elif name.startswith("step"):
            # "step" or "step:DIV" to sweep the hub break-even divisor
            if ":" in name:
                import recbole_tpu.ops.graph as G
                G.HUB_BREAK_EVEN_DIV = float(name.split(":")[1])
                print(f"  (HUB_BREAK_EVEN_DIV={G.HUB_BREAK_EVEN_DIV})")
            t = bench_step(u, i, w, restricted=True)
            print(f"restricted train step (2 full applies): {t*1e3:8.1f} ms "
                  f"-> {t * 1134:6.1f} s/epoch @2048 (ref 67.9)")
        elif name == "fullstep":
            t = bench_step(u, i, w, restricted=False)
            print(f"classic train step (4 full applies):    {t*1e3:8.1f} ms "
                  f"-> {t * 1134:6.1f} s/epoch @2048 (ref 67.9)")
        elif name == "hub":
            for H in (4096, 8192, 16384):
                t, frac = bench_hub(u, i, w, H)
                print(f"hub{H:>6} 2-layer fwd+bwd: {t * 1e3:8.1f} ms/step "
                      f"(covers {frac * 100:.1f}% of edges)")


if __name__ == "__main__":
    main()
