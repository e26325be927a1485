"""Fused transformer LAYER Pallas kernel for short-sequence recommenders.

ops/fused_attention.py fuses only the attention chain and measured
net-neutral at catalog shapes: profiling SASRec at ml-1m shape shows the
layer is VPU/elementwise-bound — ~30 small ops per layer over (B, L, 64)
tensors (projections, transposes, softmax chain, two LayerNorms, FFN,
residuals, four dropout sites) each costing an HBM round-trip, while the
MXU FLOPs amount to ~30us. This kernel runs the ENTIRE reference
TransformerLayer (layers.py:469-504: MHA -> out-proj -> dropout -> add&LN
-> FFN -> dropout -> add&LN) per batch block in VMEM:

    HBM traffic = read(x, params, key_valid) + write(y).

The backward kernel RECOMPUTES the forward internals from x and the params
(nothing but the residuals ever existed in HBM) and REGENERATES the dropout
masks from the same per-block seed, producing dx plus parameter gradients
accumulated across the sequential batch grid (constant out index_map,
init-on-first-block).

Semantics match models/layers.py::transformer_apply (itself pinned to the
reference by the oracle parity suite) bit-for-bit modulo dropout RNG
streams and fp32 summation order.

HONEST MEASUREMENT (v5e, SASRec ml-1m shape: B=2048 L=50 D=64 H=2 I=256):
the kernel does NOT beat XLA — 3.1 vs 2.6 ms forward, 8.2 vs 5.0 ms
fwd+bwd per layer. At these shapes every matmul operand is mostly MXU-tile
padding (L=50 pads to 56x128 lanes) and XLA's elementwise fusion already
collapses the pointwise chain, so the hand kernel's per-head lane-slice
relayouts cost more than the HBM round-trips it saves. Kept as the
pinned-correct single-dispatch implementation — opt in with
``fused_attention: "layer"`` — because the balance flips for larger-D
transformer configs where the (B,H,L,L) probability tensors dominate HBM.
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
SQRT_2 = math.sqrt(2.0)
INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)

PARAM_KEYS = ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
              "ln1_g", "ln1_b", "ff1_w", "ff1_b", "ff2_w", "ff2_b",
              "ln2_g", "ln2_b")


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| <= 1.5e-7 — below
    fp32 activation noise); Mosaic has no erf lowering."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _act_fns(act):
    if act == "gelu":  # exact erf form (reference layers.py:283)
        f = lambda x: x * 0.5 * (1.0 + _erf(x / SQRT_2))
        df = lambda x: (0.5 * (1.0 + _erf(x / SQRT_2))
                        + x * INV_SQRT_2PI * jnp.exp(-0.5 * x * x))
    elif act == "relu":
        f = lambda x: jnp.maximum(x, 0.0)
        df = lambda x: (x > 0.0).astype(jnp.float32)
    elif act == "swish":
        def f(x):
            return x * jax.nn.sigmoid(x)

        def df(x):
            s = jax.nn.sigmoid(x)
            return s + x * s * (1.0 - s)
    elif act == "tanh":
        f = jnp.tanh
        df = lambda x: 1.0 - jnp.tanh(x) ** 2
    elif act == "sigmoid":
        f = jax.nn.sigmoid

        def df(x):
            s = jax.nn.sigmoid(x)
            return s * (1.0 - s)
    else:
        raise ValueError(f"unsupported activation {act!r}")
    return f, df


def _build_mask(valid, bb, L, causal):
    key_ok = valid[:, None, :] > 0                        # (bb, 1, L)
    if causal:
        ql = jax.lax.broadcasted_iota(jnp.int32, (bb, L, L), 1)
        kl = jax.lax.broadcasted_iota(jnp.int32, (bb, L, L), 2)
        key_ok = key_ok & (kl <= ql)
    else:
        # bidirectional masks the QUERY side too (BERT4Rec-style symmetric
        # mask — layers.py bidirectional_attention_mask)
        key_ok = key_ok & (valid[:, :, None] > 0)
    return jnp.where(key_ok, 0.0, NEG)


def _keep_mask(shape, rate):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return (bits >= threshold).astype(jnp.float32) / (1.0 - rate)


def _softmax(scores):
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _bmm(a, b, ca, cb):
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _mm(a, b, ta=False, tb=False):
    ca = 0 if ta else 1
    cb = 1 if tb else 0
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _ln_fwd(x, g, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    return xhat * g + b, xhat, inv


def _ln_bwd(dy, xhat, inv, g):
    """dx for y = xhat*g + b; also returns (dgamma, dbeta) summands."""
    dg = jnp.sum(dy * xhat, axis=0)
    db = jnp.sum(dy, axis=0)
    dxhat = dy * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * inv
    return dx, dg, db


def _gen_masks(bb, L, D, H, attn_rate, rate):
    """Dropout keep-masks in a FIXED generation order shared by the
    forward and backward kernels (PRNG replay): per-head attention probs,
    attention output, FFN output."""
    attn_keeps = []
    if attn_rate > 0.0:
        for _ in range(H):
            attn_keeps.append(_keep_mask((bb, L, L), attn_rate))
    if rate > 0.0:
        k_attn_out = _keep_mask((bb * L, D), rate)
        k_ffn = _keep_mask((bb * L, D), rate)
    else:
        k_attn_out = k_ffn = None
    return attn_keeps, k_attn_out, k_ffn


def _forward_core(x2, valid, p, masks, *, bb, H, L, D, hd, causal, act, eps):
    """Shared forward recomputation: returns everything backward needs."""
    f, _ = _act_fns(act)
    attn_keeps, k_attn_out, k_ffn = masks
    mask = _build_mask(valid, bb, L, causal)
    scale = 1.0 / math.sqrt(hd)

    q2 = _mm(x2, p["wq"]) + p["bq"]
    k2 = _mm(x2, p["wk"]) + p["bk"]
    v2 = _mm(x2, p["wv"]) + p["bv"]
    # heads via LANE slices (Mosaic cannot reshape-split the lane dim)
    hs = lambda t, h: t[:, h * hd:(h + 1) * hd].reshape(bb, L, hd)
    q_heads = [hs(q2, h) for h in range(H)]
    k_heads = [hs(k2, h) for h in range(H)]
    v_heads = [hs(v2, h) for h in range(H)]
    ctx_heads = []
    probs_heads = []
    for h in range(H):
        scores = _bmm(q_heads[h], k_heads[h], 2, 2) * scale + mask
        probs = _softmax(scores)
        if attn_keeps:
            probs = probs * attn_keeps[h]
        probs_heads.append(probs)
        ctx_heads.append(_bmm(probs, v_heads[h], 2, 1))      # (bb, L, hd)
    ctx = jnp.concatenate(
        [c.reshape(bb * L, hd) for c in ctx_heads], axis=-1)
    attn_out = _mm(ctx, p["wo"]) + p["bo"]
    if k_attn_out is not None:
        attn_out = attn_out * k_attn_out
    r1 = x2 + attn_out
    a1, xhat1, inv1 = _ln_fwd(r1, p["ln1_g"], p["ln1_b"], eps)
    f1 = _mm(a1, p["ff1_w"]) + p["ff1_b"]
    fa = f(f1)
    f2 = _mm(fa, p["ff2_w"]) + p["ff2_b"]
    if k_ffn is not None:
        f2 = f2 * k_ffn
    r2 = a1 + f2
    y, xhat2, inv2 = _ln_fwd(r2, p["ln2_g"], p["ln2_b"], eps)
    return dict(q_heads=q_heads, k_heads=k_heads, v_heads=v_heads,
                probs_heads=probs_heads, ctx=ctx,
                xhat1=xhat1, inv1=inv1, a1=a1, f1=f1, fa=fa,
                xhat2=xhat2, inv2=inv2, mask=mask, scale=scale, y=y)


def _fwd_kernel(seed_ref, x_ref, valid_ref, *refs, bb, H, L, D, I, hd,
                causal, act, eps, attn_rate, rate, n_param_grads):
    p = {k: refs[i][:] for i, k in enumerate(PARAM_KEYS)}
    p = {k: (v[0] if v.ndim == 2 and v.shape[0] == 1 else v)
         for k, v in p.items()}
    y_ref = refs[len(PARAM_KEYS)]
    if attn_rate > 0.0 or rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    masks = _gen_masks(bb, L, D, H, attn_rate, rate)
    x2 = x_ref[:].reshape(bb * L, D)
    out = _forward_core(x2, valid_ref[:], p, masks, bb=bb, H=H, L=L, D=D,
                        hd=hd, causal=causal, act=act, eps=eps)
    y_ref[:] = out["y"].reshape(bb, L, D)


def _bwd_kernel(seed_ref, x_ref, valid_ref, *refs, bb, H, L, D, I, hd,
                causal, act, eps, attn_rate, rate, n_param_grads):
    p = {k: refs[i][:] for i, k in enumerate(PARAM_KEYS)}
    p = {k: (v[0] if v.ndim == 2 and v.shape[0] == 1 else v)
         for k, v in p.items()}
    dy_ref = refs[len(PARAM_KEYS)]
    dx_ref = refs[len(PARAM_KEYS) + 1]
    grad_refs = refs[len(PARAM_KEYS) + 2:]
    _, dfn = _act_fns(act)
    if attn_rate > 0.0 or rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    masks = _gen_masks(bb, L, D, H, attn_rate, rate)
    attn_keeps, k_attn_out, k_ffn = masks

    x2 = x_ref[:].reshape(bb * L, D)
    o = _forward_core(x2, valid_ref[:], p, masks, bb=bb, H=H, L=L, D=D,
                      hd=hd, causal=causal, act=act, eps=eps)
    dy = dy_ref[:].reshape(bb * L, D)

    # LN2
    dr2, dg2, db2 = _ln_bwd(dy, o["xhat2"], o["inv2"], p["ln2_g"])
    # FFN
    df2 = dr2 if k_ffn is None else dr2 * k_ffn
    dff2_w = _mm(o["fa"], df2, ta=True)
    dff2_b = jnp.sum(df2, axis=0)
    dfa = _mm(df2, p["ff2_w"], tb=True)
    df1 = dfa * dfn(o["f1"])
    dff1_w = _mm(o["a1"], df1, ta=True)
    dff1_b = jnp.sum(df1, axis=0)
    da1 = dr2 + _mm(df1, p["ff1_w"], tb=True)
    # LN1
    dr1, dg1, db1 = _ln_bwd(da1, o["xhat1"], o["inv1"], p["ln1_g"])
    dx2 = dr1
    dattn = dr1 if k_attn_out is None else dr1 * k_attn_out
    dwo = _mm(o["ctx"], dattn, ta=True)
    dbo = jnp.sum(dattn, axis=0)
    dctx2 = _mm(dattn, p["wo"], tb=True)                  # (bb*L, D)
    # attention backward per head (lane slices, as in forward)
    dq_heads, dk_heads, dv_heads = [], [], []
    for h in range(H):
        probs = o["probs_heads"][h]                       # post-dropout P
        do_h = dctx2[:, h * hd:(h + 1) * hd].reshape(bb, L, hd)
        dv_heads.append(_bmm(probs, do_h, 1, 1))
        dp = _bmm(do_h, o["v_heads"][h], 2, 2)
        if attn_keeps:
            dp = dp * attn_keeps[h]
        # softmax backward needs the PRE-dropout probabilities — rebuild
        # (probs_heads stores the post-dropout scaled ones)
        scores = _bmm(o["q_heads"][h], o["k_heads"][h], 2, 2) \
            * o["scale"] + o["mask"]
        probs0 = _softmax(scores)
        ds = probs0 * (dp - jnp.sum(dp * probs0, axis=-1, keepdims=True))
        ds = ds * o["scale"]
        dq_heads.append(_bmm(ds, o["k_heads"][h], 2, 1))
        dk_heads.append(_bmm(ds, o["q_heads"][h], 1, 1))
    flat_cat = lambda hs_: jnp.concatenate(
        [t.reshape(bb * L, hd) for t in hs_], axis=-1)
    dq2 = flat_cat(dq_heads)
    dk2 = flat_cat(dk_heads)
    dv2 = flat_cat(dv_heads)
    dwq = _mm(x2, dq2, ta=True)
    dwk = _mm(x2, dk2, ta=True)
    dwv = _mm(x2, dv2, ta=True)
    dbq = jnp.sum(dq2, axis=0)
    dbk = jnp.sum(dk2, axis=0)
    dbv = jnp.sum(dv2, axis=0)
    dx2 = dx2 + _mm(dq2, p["wq"], tb=True) + _mm(dk2, p["wk"], tb=True) \
        + _mm(dv2, p["wv"], tb=True)
    dx_ref[:] = dx2.reshape(bb, L, D)

    grads = (dwq, dbq[None], dwk, dbk[None], dwv, dbv[None], dwo, dbo[None],
             dg1[None], db1[None], dff1_w, dff1_b[None], dff2_w,
             dff2_b[None], dg2[None], db2[None])

    first = pl.program_id(0) == 0
    for ref, g in zip(grad_refs, grads):
        @pl.when(first)
        def _init(ref=ref):
            ref[:] = jnp.zeros(ref.shape, jnp.float32)
        ref[:] += g.astype(jnp.float32)


def _batch_block(B, H, L, D, I):
    """Batch block fitting the recompute working set in scoped VMEM."""
    pad = lambda x, m: ((x + m - 1) // m) * m
    budget = int(os.environ.get("RECBOLE_TPU_TRM_BUDGET", 9 * 1024 * 1024))
    for cand in (128, 64, 32, 16, 8):
        if B % cand:
            continue
        Lp, Dp, Ip = pad(L, 8), pad(D, 128), pad(I, 128)
        score = cand * pad(L, 8) * pad(L, 128) * 4
        flat = cand * L
        rows = pad(flat, 8)
        # live set ≈ per-head score chain (x4 temporaries) + the flat
        # activations (x ~10 tensors of (rows, Dp)) + FFN intermediates
        est = 4 * H * score + 10 * rows * Dp * 4 + 3 * rows * Ip * 4
        if est <= budget:
            return cand
    return None


def fused_layer_supported(B, H, L, D, inner, act):
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if D % H:
        return False
    try:
        _act_fns(act)
    except ValueError:
        return False
    return _batch_block(B, H, L, D, inner) is not None


@functools.lru_cache(maxsize=None)
def _make_layer(B, H, L, D, I, causal, act, eps, attn_rate, rate, interpret):
    bb = _batch_block(B, H, L, D, I)
    hd = D // H
    grid = (B // bb,)
    kw = {} if interpret else {"memory_space": pltpu.VMEM}
    x_spec = pl.BlockSpec((bb, L, D), lambda i: (i, 0, 0), **kw)
    valid_spec = pl.BlockSpec((bb, L), lambda i: (i, 0), **kw)
    skw = {} if interpret else {"memory_space": pltpu.SMEM}
    seed_spec = pl.BlockSpec((1,), lambda i: (0,), **skw)

    param_shapes = {
        "wq": (D, D), "bq": (1, D), "wk": (D, D), "bk": (1, D),
        "wv": (D, D), "bv": (1, D), "wo": (D, D), "bo": (1, D),
        "ln1_g": (1, D), "ln1_b": (1, D),
        "ff1_w": (D, I), "ff1_b": (1, I), "ff2_w": (I, D), "ff2_b": (1, D),
        "ln2_g": (1, D), "ln2_b": (1, D),
    }

    def pspec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **kw)

    param_specs = [pspec(param_shapes[k]) for k in PARAM_KEYS]
    grad_specs = [pspec(param_shapes[k]) for k in PARAM_KEYS]
    grad_shapes = [jax.ShapeDtypeStruct(param_shapes[k], jnp.float32)
                   for k in PARAM_KEYS]

    common = dict(bb=bb, H=H, L=L, D=D, I=I, hd=hd, causal=causal, act=act,
                  eps=eps, attn_rate=attn_rate, rate=rate,
                  n_param_grads=len(PARAM_KEYS))
    cp = (None if interpret else
          pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=100 * 1024 * 1024))
    ckw = {} if interpret else {"compiler_params": cp}

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, **common),
        grid=grid,
        in_specs=[seed_spec, x_spec, valid_spec] + param_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, D), jnp.float32),
        interpret=interpret, **ckw)
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, **common),
        grid=grid,
        in_specs=([seed_spec, x_spec, valid_spec] + param_specs + [x_spec]),
        out_specs=[x_spec] + grad_specs,
        out_shape=([jax.ShapeDtypeStruct((B, L, D), jnp.float32)]
                   + grad_shapes),
        interpret=interpret, **ckw)

    @jax.custom_vjp
    def layer(x, valid, seed, *params):
        return fwd_call(seed, x, valid, *params)

    def fwd(x, valid, seed, *params):
        return layer(x, valid, seed, *params), (x, valid, seed, params)

    def bwd(res, dy):
        x, valid, seed, params = res
        outs = bwd_call(seed, x, valid, *params, dy)
        dx, dparams = outs[0], outs[1:]
        return (dx, None, None, *dparams)

    layer.defvjp(fwd, bwd)
    return layer


def fused_transformer_layer(x, layer_params, key_valid, seed, *, n_heads,
                            causal, act="gelu", eps=1e-12, dropout=0.0,
                            attn_dropout=0.0, interpret=False):
    """One reference TransformerLayer on (B, L, D) fp32 x.

    layer_params: the models/layers.py transformer_init dict for one layer
    (wq/bq/.../ln2_b). key_valid: (B, L) int (1 = real key). seed: (1,)
    int32, ignored when both dropout rates are zero.
    """
    B, L, D = x.shape
    I = layer_params["ff1_w"].shape[1]
    fn = _make_layer(B, n_heads, L, D, I, bool(causal), act, float(eps),
                     float(attn_dropout), float(dropout), interpret)
    flat = []
    for k in PARAM_KEYS:
        v = layer_params[k]
        flat.append(v[None] if v.ndim == 1 else v)
    return fn(x, key_valid.astype(jnp.int32), seed.astype(jnp.int32), *flat)
