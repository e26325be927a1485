"""Pallas op tests (interpret mode on CPU; compiled path covered on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from recbole_tpu.ops.masked_topk import masked_topk_pallas, masked_topk_xla


@pytest.mark.parametrize("n_items", [300, 1024, 2500])
def test_masked_topk_matches_xla(n_items):
    rng = np.random.RandomState(3)
    B, D, K = 16, 32, 5
    q = jnp.asarray(rng.randn(B, D).astype(np.float32))
    items = jnp.asarray(rng.randn(n_items, D).astype(np.float32))
    mask = np.zeros((B, n_items), np.int8)
    mask[:, 0] = 1
    for b in range(B):
        mask[b, rng.choice(n_items, min(40, n_items // 4), replace=False)] = 1
    mask = jnp.asarray(mask)
    v_ref, i_ref = masked_topk_xla(q, items, mask, K)
    v, i = masked_topk_pallas(q, items, mask, K, tile_n=512, interpret=True)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    # masked ids never returned
    m = np.asarray(mask)
    for b in range(v.shape[0]):
        assert not m[b, np.asarray(i)[b]].any()


def test_fused_attention_matches_xla():
    """Pallas fused attention (interpret mode) == XLA reference, fwd + grads,
    causal and bidirectional, with ragged key-validity."""
    import jax
    from recbole_tpu.ops.fused_attention import fused_attention, attention_xla
    rng = np.random.RandomState(0)
    B, L, H, hd = 16, 50, 2, 32
    q = jnp.asarray(rng.randn(B, L, H, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, hd).astype(np.float32))
    lens = rng.randint(1, L + 1, B)
    valid = jnp.asarray((np.arange(L)[None] < lens[:, None]).astype(np.int32))
    seed = jnp.zeros((1,), jnp.int32)
    # on a real TPU backend the XLA side's fp32 matmuls take multi-pass
    # bf16 (~1e-6 per op, exp-amplified); interpret-vs-XLA on CPU is exact
    tol = 1e-5 if jax.default_backend() != "tpu" else 5e-4
    for causal in (True, False):
        o1 = fused_attention(q, k, v, valid, seed, causal=causal,
                             interpret=True)
        o2 = attention_xla(q, k, v, valid, causal=causal)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=tol, atol=tol)
        g1 = jax.grad(lambda a, b, c: jnp.sum(jnp.sin(
            fused_attention(a, b, c, valid, seed, causal=causal,
                            interpret=True))), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda a, b, c: jnp.sum(jnp.sin(
            attention_xla(a, b, c, valid, causal=causal))),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_fused_attention_dropout_unbiased():
    """Dropout: seed-deterministic, unbiased vs no-dropout. Needs the real
    TPU PRNG (pltpu.prng_random_bits is NotImplemented in interpret mode)."""
    import jax
    import pytest
    if jax.default_backend() != "tpu":
        pytest.skip("TPU hardware PRNG required (interpret mode lacks it)")
    from recbole_tpu.ops.fused_attention import fused_attention
    rng = np.random.RandomState(1)
    B, L, H, hd = 8, 20, 2, 16
    q = jnp.asarray(rng.randn(B, L, H, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, hd).astype(np.float32))
    valid = jnp.ones((B, L), jnp.int32)

    def f(s):
        return fused_attention(q, k, v, valid, jnp.array([s], jnp.int32),
                               causal=True, dropout_rate=0.5)
    o = fused_attention(q, k, v, valid, jnp.zeros((1,), jnp.int32),
                        causal=True)
    d0, d0b, d1 = f(0), f(0), f(1)
    assert np.allclose(np.asarray(d0), np.asarray(d0b))
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    avg = sum(np.asarray(f(s * 7919)) for s in range(64)) / 64
    err = np.mean(np.abs(avg - np.asarray(o))) / np.mean(np.abs(np.asarray(o)))
    assert err < 0.2, f"dropout bias too large: {err}"


def test_fused_gru_matches_scan():
    """Pallas fused GRU (interpret) == the lax.scan path, fwd + all grads,
    zero and nonzero h0."""
    import jax
    from recbole_tpu.ops.fused_gru import fused_gru
    from recbole_tpu.models.layers import gru_init, gru_apply
    rng = np.random.RandomState(0)
    B, L, D, H = 16, 13, 8, 24
    layer = gru_init(jax.random.PRNGKey(0), D, H)[0]
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    xi = jnp.dot(x, layer["wi"]) + layer["bi"]

    for h0 in (jnp.zeros((B, H)),
               jnp.asarray(rng.randn(B, H).astype(np.float32))):
        def fused_loss(xi, h0, wh, bh):
            return jnp.sum(jnp.sin(fused_gru(xi, h0, wh, bh,
                                             interpret=True)))

        def scan_loss(xi, h0, wh, bh):
            def step(h, xi_t):
                hh = jnp.dot(h, wh) + bh
                ir, iz, in_ = jnp.split(xi_t, 3, -1)
                hr, hz, hn = jnp.split(hh, 3, -1)
                r = jax.nn.sigmoid(ir + hr)
                z = jax.nn.sigmoid(iz + hz)
                n = jnp.tanh(in_ + r * hn)
                hn_ = (1 - z) * n + z * h
                return hn_, hn_
            _, outs = jax.lax.scan(step, h0, xi.transpose(1, 0, 2))
            return jnp.sum(jnp.sin(outs.transpose(1, 0, 2)))

        args = (xi, h0, layer["wh"], layer["bh"])

        def scan_outs(h0):
            def step(h, xi_t):
                hh = jnp.dot(h, layer["wh"]) + layer["bh"]
                ir, iz, in_ = jnp.split(xi_t, 3, -1)
                hr, hz, hn = jnp.split(hh, 3, -1)
                r = jax.nn.sigmoid(ir + hr)
                z = jax.nn.sigmoid(iz + hz)
                n = jnp.tanh(in_ + r * hn)
                hn_ = (1 - z) * n + z * h
                return hn_, hn_
            return jax.lax.scan(step, h0,
                                xi.transpose(1, 0, 2))[1].transpose(1, 0, 2)

        np.testing.assert_allclose(
            np.asarray(fused_gru(*args, interpret=True)),
            np.asarray(scan_outs(h0)), rtol=1e-5, atol=1e-6)
        g1 = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(*args)
        g2 = jax.grad(scan_loss, argnums=(0, 1, 2, 3))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)


def test_sorted_edge_propagate_matches_autodiff():
    """Scatter-free custom VJP == plain gather+segment_sum autodiff."""
    import jax
    from recbole_tpu.ops.edge_prop import (build_sorted_edge_consts,
                                           sorted_edge_propagate)
    rng = np.random.RandomState(0)
    N, E, D = 50, 400, 8
    heads = rng.randint(0, N, E)
    tails = rng.randint(0, N, E)
    order, c = build_sorted_edge_consts(heads, tails, N)
    x = jnp.asarray(rng.randn(N, D).astype(np.float32))
    att = jnp.asarray(rng.rand(E).astype(np.float32))[jnp.asarray(order)]
    args = tuple(jnp.asarray(c[k]) for k in
                 ["ep_heads", "ep_tails", "ep_tail_perm", "ep_tstarts",
                  "ep_tends", "ep_hstarts", "ep_hends"])

    def f_custom(x, att):
        return jnp.sum(jnp.sin(sorted_edge_propagate(x, att, *args)))

    def f_ref(x, att):
        msgs = x[args[1]] * att[:, None]
        return jnp.sum(jnp.sin(
            jax.ops.segment_sum(msgs, args[0], num_segments=N)))

    np.testing.assert_allclose(f_custom(x, att), f_ref(x, att), rtol=1e-5)
    g1 = jax.grad(f_custom, argnums=(0, 1))(x, att)
    g2 = jax.grad(f_ref, argnums=(0, 1))(x, att)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ell_propagate_matches_segment_sum():
    """Degree-bucketed ELL gather+reduce == gather+segment_sum reference,
    forward and d_x; att cotangent is zero by the op's stop-grad semantics.
    Graph includes a hub node and zero-degree nodes."""
    import jax
    from recbole_tpu.ops.edge_prop import build_ell_consts, ell_propagate
    rng = np.random.RandomState(1)
    N, D = 60, 8
    heads = np.concatenate([rng.randint(0, 40, 300),
                            np.full(90, 7)])   # node 7 is a hub; 40..59 deg-0 heads
    tails = rng.randint(0, N, len(heads))
    order = np.argsort(heads, kind="stable")
    heads, tails = heads[order], tails[order]
    consts, shapes = build_ell_consts(heads, tails, N)
    args = tuple(jnp.asarray(consts[k]) for k in
                 ["ellf_eidx", "ellf_nbr", "ellf_inv",
                  "ellb_eidx", "ellb_nbr", "ellb_inv"])
    x = jnp.asarray(rng.randn(N, D).astype(np.float32))
    att = jnp.asarray(rng.rand(len(heads)).astype(np.float32))

    def f_ell(x, att):
        return jnp.sum(jnp.sin(ell_propagate(shapes, x, att, *args)))

    def f_ref(x, att):
        msgs = x[jnp.asarray(tails)] * att[:, None]
        return jnp.sum(jnp.sin(
            jax.ops.segment_sum(msgs, jnp.asarray(heads), num_segments=N)))

    np.testing.assert_allclose(f_ell(x, att), f_ref(x, att), rtol=1e-5)
    g1 = jax.grad(f_ell, argnums=(0, 1))(x, att)
    g2 = jax.grad(f_ref, argnums=(0, 1))(x, att)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-4, atol=1e-5)
    # att is stop-gradient'd inside the op
    np.testing.assert_allclose(np.asarray(g1[1]), 0.0, atol=0)


def test_bipartite_prop_dense_matches_sparse():
    """Dense-MXU and edge-list segment-sum propagation agree."""
    import scipy.sparse as sp
    from recbole_tpu.ops.graph import BipartiteProp
    rng = np.random.RandomState(0)
    n_u, n_i, nnz = 50, 70, 400
    u = rng.randint(0, n_u, nnz)
    i = rng.randint(0, n_i, nnz)
    mat = sp.coo_matrix((np.ones(nnz, np.float32), (u, i)),
                        shape=(n_u, n_i)).tocsr()
    dense = BipartiteProp(mat, n_u, n_i)
    sparse = BipartiteProp(mat, n_u, n_i, dense_budget=1, hybrid=False)
    assert dense.dense and not sparse.dense
    x = jnp.asarray(rng.randn(n_u + n_i, 16).astype(np.float32))
    import jax
    # the dense path's matmul runs at TPU default precision (one-pass
    # bf16, ~0.4% — the deliberate speed trade-off behind the GCMC/DGCF
    # wins; quality parity is pinned end-to-end in PARITY.md) while the
    # edge path accumulates in fp32
    tol = 2e-4 if jax.default_backend() != "tpu" else 2e-2
    np.testing.assert_allclose(np.asarray(dense(dense.init_consts(), x)),
                               np.asarray(sparse(sparse.init_consts(), x)),
                               rtol=tol, atol=tol)


def test_bipartite_prop_hybrid_matches_dense():
    """Hub-dense + ELL-tail hybrid (the Yelp-scale path, ops/graph.py)
    matches the exact dense path: values and grads, hub and tail both
    non-empty, on a power-law item-popularity graph. The hub block is
    stored bf16, hence the loose tolerance."""
    import scipy.sparse as sp
    import jax
    from recbole_tpu.ops import graph as G
    rng = np.random.RandomState(1)
    n_u, n_i, nnz = 120, 90, 3000
    u = rng.randint(0, n_u, nnz)
    i = np.floor((n_i - 1) * rng.random(nnz) ** 2.2).astype(np.int64)
    mat = sp.coo_matrix((np.ones(nnz, np.float32), (u, i)),
                        shape=(n_u, n_i)).tocsr()
    dense = G.BipartiteProp(mat, n_u, n_i)
    hyb = G.BipartiteProp(mat, n_u, n_i, dense_budget=1)
    assert hyb.hybrid and not hyb.dense
    assert 0 < hyb.hub_size < n_i  # both halves exercised
    x = jnp.asarray(rng.randn(n_u + n_i, 16).astype(np.float32))
    yd = np.asarray(dense(dense.init_consts(), x))
    yh = np.asarray(hyb(hyb.init_consts(), x))
    scale = np.abs(yd).max()
    np.testing.assert_allclose(yh, yd, atol=1.2e-2 * scale)
    gd = jax.grad(lambda a: jnp.sum(dense(dense.init_consts(), a) ** 2))(x)
    gh = jax.grad(lambda a: jnp.sum(hyb(hyb.init_consts(), a) ** 2))(x)
    gs = np.abs(np.asarray(gd)).max()
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gd),
                               atol=1.2e-2 * gs)


def test_bipartite_prop_hybrid_extremes():
    """Hybrid with an all-hub graph (every item above threshold) and an
    all-tail graph (uniform low degree) both stay correct."""
    import scipy.sparse as sp
    from recbole_tpu.ops import graph as G
    rng = np.random.RandomState(2)
    # all-hub: few items, many users -> every item degree > threshold
    n_u, n_i, nnz = 200, 4, 800
    u = rng.randint(0, n_u, nnz)
    i = rng.randint(0, n_i, nnz)
    mat = sp.coo_matrix((np.ones(nnz, np.float32), (u, i)),
                        shape=(n_u, n_i)).tocsr()
    dense = G.BipartiteProp(mat, n_u, n_i)
    hyb = G.BipartiteProp(mat, n_u, n_i, dense_budget=1)
    assert hyb.hub_size == n_i
    x = jnp.asarray(rng.randn(n_u + n_i, 8).astype(np.float32))
    np.testing.assert_allclose(np.asarray(hyb(hyb.init_consts(), x)),
                               np.asarray(dense(dense.init_consts(), x)),
                               atol=2e-2)
    # all-tail: every item degree 1 (below any threshold)
    n_u2, n_i2 = 40, 64
    u2 = rng.randint(0, n_u2, n_i2)
    i2 = np.arange(n_i2)
    mat2 = sp.coo_matrix((np.ones(n_i2, np.float32), (u2, i2)),
                         shape=(n_u2, n_i2)).tocsr()
    dense2 = G.BipartiteProp(mat2, n_u2, n_i2)
    hyb2 = G.BipartiteProp(mat2, n_u2, n_i2, dense_budget=1)
    assert hyb2.hub_size == 0
    x2 = jnp.asarray(rng.randn(n_u2 + n_i2, 8).astype(np.float32))
    np.testing.assert_allclose(np.asarray(hyb2(hyb2.init_consts(), x2)),
                               np.asarray(dense2(dense2.init_consts(), x2)),
                               atol=1e-4)


def test_fused_transformer_layer_matches_xla():
    """Pallas fused transformer LAYER (interpret mode) == the XLA
    transformer_apply single layer: forward, dx, and every parameter grad
    (dropout 0 — the PRNG path is TPU-only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from recbole_tpu.models.layers import transformer_init, transformer_apply
    from recbole_tpu.ops.fused_transformer import (fused_transformer_layer,
                                                   PARAM_KEYS)

    B, L, D, H, inner = 8, 10, 16, 2, 32
    rng = np.random.RandomState(0)
    params = transformer_init(jax.random.key(1, impl="rbg"), 1, H, D, inner)
    lyr = params[0]
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    seq_len = jnp.asarray(rng.randint(1, L + 1, (B,), dtype=np.int32))
    key_valid = (jnp.arange(L)[None, :] < seq_len[:, None]).astype(jnp.int32)
    seed = jnp.zeros((1,), jnp.int32)

    for causal, act in ((True, "gelu"), (False, "relu"), (True, "swish")):
        ref = transformer_apply(params, x, None, H, act=act,
                                mask_spec=(key_valid, causal), fused=False)
        out = fused_transformer_layer(x, lyr, key_valid, seed, n_heads=H,
                                      causal=causal, act=act,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        # grads: scalar loss over real positions
        w = key_valid.astype(jnp.float32)[..., None]

        def loss_ref(x_, lp):
            h = transformer_apply([lp], x_, None, H, act=act,
                                  mask_spec=(key_valid, causal), fused=False)
            return jnp.sum(h * h * w)

        def loss_fused(x_, lp):
            h = fused_transformer_layer(x_, lp, key_valid, seed, n_heads=H,
                                        causal=causal, act=act,
                                        interpret=True)
            return jnp.sum(h * h * w)

        gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, lyr)
        gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, lyr)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   rtol=2e-4, atol=2e-4)
        for k in PARAM_KEYS:
            np.testing.assert_allclose(
                np.asarray(gp_f[k]), np.asarray(gp_r[k]), rtol=2e-4,
                atol=2e-4, err_msg=f"param grad {k} ({causal}, {act})")


def test_chunked_spmm_matches_dense():
    """Sparse-path SpMM (chunked, checkpointed scan — the Yelp-scale memory
    fix) must match the dense MXU path, values and grads."""
    import numpy as np
    import scipy.sparse as sp
    import jax
    import jax.numpy as jnp
    from recbole_tpu.ops import graph as G

    rng = np.random.RandomState(0)
    n_u, n_i, E = 60, 80, 500
    u = rng.randint(0, n_u, E)
    i = rng.randint(0, n_i, E)
    m = sp.csr_matrix((np.ones(E), (u, i)), shape=(n_u, n_i))
    dense = G.BipartiteProp(m, n_u, n_i)
    old_chunk = G.EDGE_CHUNK
    try:
        G.EDGE_CHUNK = 128  # force multi-chunk at test size
        sparse = G.BipartiteProp(m, n_u, n_i, dense_budget=1, hybrid=False)
    finally:
        G.EDGE_CHUNK = old_chunk
    assert not sparse.dense
    assert sparse._consts["edge_src"].shape[0] // sparse.edge_chunk > 1
    x = jnp.asarray(rng.randn(n_u + n_i, 16).astype(np.float32))
    yd = dense(dense.init_consts(), x)
    ys = sparse(sparse.init_consts(), x)
    np.testing.assert_allclose(np.asarray(yd), np.asarray(ys), atol=1e-5)
    gd = jax.grad(lambda a: jnp.sum(dense(dense.init_consts(), a) ** 2))(x)
    gs = jax.grad(lambda a: jnp.sum(sparse(sparse.init_consts(), a) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs), atol=1e-4)
