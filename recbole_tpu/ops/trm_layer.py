"""bf16 whole-layer transformer Pallas kernel, masked-head design (round 5).

Second-generation fused TransformerLayer (reference layers.py:469-504: MHA
-> out-proj -> dropout -> add&LN -> FFN -> dropout -> add&LN). The round-4
kernel (ops/fused_transformer.py) lost to XLA for one measured reason:
splitting heads via lane slices ``t[:, h*hd:(h+1)*hd]`` forces Mosaic to
relayout every per-head operand onto fresh 32-lane tiles. This kernel never
slices the lane dimension:

  * per-head scores use FULL-WIDTH contractions with an elementwise lane
    mask on Q:  S_h = (Q * m_h) @ K^T  where m_h zeroes the other heads'
    lanes. The MXU does 2x the (trivial) flops; no operand ever changes
    shape or layout.
  * context is rebuilt the same way:  ctx = sum_h (P_h @ V) * m_h-free
    (V masked instead), so ctx lands directly in the (rows, D) layout the
    out-projection wants — no concatenate.
  * the backward applies the identical trick to dq/dk/dv.

Everything else follows the round-4 recipe that was already right: whole
layer per batch block in VMEM (HBM traffic = x in, y out, params), backward
recomputes the forward from x (custom VJP, no residuals in HBM), dropout
masks regenerated from the same per-block seed via the TPU hardware PRNG.

New in this generation: matmul operands ride bf16 (fp32 accumulate via
preferred_element_type), matching the bf16 XLA path the sequential family
runs in production (models/base.py _auto_compute_dtype). Softmax and
LayerNorm statistics stay fp32.

Semantics match models/layers.py::transformer_apply with
compute_dtype=bfloat16 modulo dropout RNG streams and summation order.

MEASURED (v5e, SASRec ml-1m shape B=2048 L=50 D=64 H=2 I=256, bf16 XLA
baseline incl. its dropout-layout copies): see PARITY.md round-5 section —
this kernel replaces the measured 40%-layout-copy share of the step.

A residual-saving backward (fwd also writes pre-dropout probs bf16 +
ctx; bwd skips the score matmuls/softmaxes/mask/ctx rebuild) was built
and measured NET-NEUTRAL — chained A/B at the production shape: 4.597
(save) vs 4.584 ms (full recompute) per layer grad+dropout. The
quadratic recompute rides entirely in the shadow of whatever binds the
kernel (the saved-residual HBM round-trip offsets the compute saved), so
the simpler recompute-only design stays.
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
BF16 = jnp.bfloat16

PARAM_KEYS = ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
              "ln1_g", "ln1_b", "ff1_w", "ff1_b", "ff2_w", "ff2_b",
              "ln2_g", "ln2_b")


def _erf(x):
    """A&S 7.1.26 rational erf (|err| <= 1.5e-7); Mosaic has no erf."""
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
    """Batched matmul over leading batch dim, bf16 operands, fp32 out."""
    return jax.lax.dot_general(
        a.astype(BF16), b.astype(BF16), (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _mm(a, b, ta=False, tb=False):
    ca = 0 if ta else 1
    cb = 1 if tb else 0
    return jax.lax.dot_general(
        a.astype(BF16), b.astype(BF16), (((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32)


def _ln_fwd(x, g, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    return xhat * g + b, xhat, inv


def _ln_bwd(dy, xhat, inv, g):
    dg = jnp.sum(dy * xhat, axis=0)
    db = jnp.sum(dy, axis=0)
    dxhat = dy * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * inv
    return dx, dg, db


def _lane_masks(H, hd, D):
    """(1, D) float masks selecting each head's lane range — built from
    iota, so they cost two VPU ops and zero memory traffic."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    return [(lane // hd == h).astype(jnp.float32) for h in range(H)]


def _gen_masks(bb, L, D, H, attn_rate, rate):
    """Dropout keep-masks in a FIXED order shared by fwd/bwd (PRNG replay):
    per-head attention probs, attention output, FFN output."""
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
    f, _ = _act_fns(act)
    attn_keeps, k_attn_out, k_ffn = masks
    mask = _build_mask(valid, bb, L, causal)
    scale = 1.0 / math.sqrt(hd)
    lm = _lane_masks(H, hd, D)

    q2 = _mm(x2, p["wq"]) + p["bq"]                       # (R, D) fp32
    k2 = _mm(x2, p["wk"]) + p["bk"]
    v2 = _mm(x2, p["wv"]) + p["bv"]
    q3 = q2.reshape(bb, L, D)
    k3 = k2.reshape(bb, L, D)
    v3 = v2.reshape(bb, L, D)
    probs_heads = []
    probs0_heads = []
    ctx = jnp.zeros((bb, L, D), jnp.float32)
    for h in range(H):
        # full-width contraction; m_h zeroes the other heads' lanes of Q
        scores = _bmm(q3 * lm[h], k3, 2, 2) * scale + mask
        probs0 = _softmax(scores)
        probs0_heads.append(probs0)
        probs = probs0 * attn_keeps[h] if attn_keeps else probs0
        probs_heads.append(probs)
        # V masked the same way: P_h @ (V * m_h) lands in head-h lanes only
        ctx = ctx + _bmm(probs, v3 * lm[h], 2, 1)
    ctx2 = ctx.reshape(bb * L, D)
    attn_out = _mm(ctx2, p["wo"]) + p["bo"]
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
    return dict(q3=q3, k3=k3, v3=v3, probs_heads=probs_heads,
                probs0_heads=probs0_heads, ctx2=ctx2,
                xhat1=xhat1, inv1=inv1, a1=a1, f1=f1, fa=fa,
                xhat2=xhat2, inv2=inv2, mask=mask, scale=scale, lm=lm, y=y)


def _fwd_kernel(seed_ref, x_ref, valid_ref, *refs, bb, H, L, D, I, hd,
                causal, act, eps, attn_rate, rate):
    p = {k: refs[i][:] for i, k in enumerate(PARAM_KEYS)}
    p = {k: (v[0] if v.ndim == 2 and v.shape[0] == 1 else v)
         for k, v in p.items()}
    y_ref = refs[len(PARAM_KEYS)]
    if attn_rate > 0.0 or rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    masks = _gen_masks(bb, L, D, H, attn_rate, rate)
    x2 = x_ref[:]                                         # (bb*L, D) block
    out = _forward_core(x2, valid_ref[:], p, masks, bb=bb, H=H, L=L, D=D,
                        hd=hd, causal=causal, act=act, eps=eps)
    y_ref[:] = out["y"]


def _bwd_kernel(seed_ref, x_ref, valid_ref, *refs, bb, H, L, D, I, hd,
                causal, act, eps, attn_rate, rate):
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

    x2 = x_ref[:]                                         # (bb*L, D) block
    o = _forward_core(x2, valid_ref[:], p, masks, bb=bb, H=H, L=L, D=D,
                      hd=hd, causal=causal, act=act, eps=eps)
    dy = dy_ref[:]
    lm = o["lm"]

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
    dattn = dr1 if k_attn_out is None else dr1 * k_attn_out
    dwo = _mm(o["ctx2"], dattn, ta=True)
    dbo = jnp.sum(dattn, axis=0)
    dctx3 = _mm(dattn, p["wo"], tb=True).reshape(bb, L, D)
    # attention backward — masked-head full-width contractions
    dq3 = jnp.zeros((bb, L, D), jnp.float32)
    dk3 = jnp.zeros((bb, L, D), jnp.float32)
    dv3 = jnp.zeros((bb, L, D), jnp.float32)
    for h in range(H):
        probs = o["probs_heads"][h]                       # post-dropout P
        do_h = dctx3 * lm[h]
        dv3 = dv3 + _bmm(probs, do_h, 1, 1)
        dp = _bmm(do_h, o["v3"] * lm[h], 2, 2)
        if attn_keeps:
            dp = dp * attn_keeps[h]
        # softmax backward needs the PRE-dropout probabilities — the
        # forward core keeps them (saving 1 bmm + 1 softmax per head)
        probs0 = o["probs0_heads"][h]
        ds = probs0 * (dp - jnp.sum(dp * probs0, axis=-1, keepdims=True))
        ds = ds * o["scale"]
        dq3 = dq3 + _bmm(ds, o["k3"] * lm[h], 2, 1)
        dk3 = dk3 + _bmm(ds, o["q3"] * lm[h], 1, 1)
    dq2 = dq3.reshape(bb * L, D)
    dk2 = dk3.reshape(bb * L, D)
    dv2 = dv3.reshape(bb * L, D)
    dwq = _mm(x2, dq2, ta=True)
    dwk = _mm(x2, dk2, ta=True)
    dwv = _mm(x2, dv2, ta=True)
    dbq = jnp.sum(dq2, axis=0)
    dbk = jnp.sum(dk2, axis=0)
    dbv = jnp.sum(dv2, axis=0)
    dx2 = dr1 + _mm(dq2, p["wq"], tb=True) + _mm(dk2, p["wk"], tb=True) \
        + _mm(dv2, p["wv"], tb=True)
    dx_ref[:] = dx2

    grads = (dwq, dbq[None], dwk, dbk[None], dwv, dbv[None], dwo, dbo[None],
             dg1[None], db1[None], dff1_w, dff1_b[None], dff2_w,
             dff2_b[None], dg2[None], db2[None])

    first = pl.program_id(0) == 0
    for ref, g in zip(grad_refs, grads):
        @pl.when(first)
        def _init(ref=ref):
            ref[:] = jnp.zeros(ref.shape, jnp.float32)
        ref[:] += g.astype(jnp.float32)


def _batch_block(B, H, L, D, I, training=True):
    """Batch block fitting the recompute working set in VMEM. With the
    masked-head design the live set is ~12 (R, D)-flats (mixed fp32/bf16),
    ~3 (R, I) FFN tensors and ~(2H+2) (bb, L, L) score-chain tensors.

    Measured on v5e at SASRec ml-1m shape (B=2048 L=50 D=64 I=256): the
    BACKWARD (recompute + grads) is VMEM-pressure bound and wants the
    smallest block (bb=8: 5.1 ms/grad vs 6.2 at bb=16, 9.9 at bb=32); the
    forward alone pipelines best at bb=16 (2.17 vs 2.43 ms). Dropout
    replay (seed + program_id) forces fwd and bwd onto the SAME grid, so
    the training instantiation (any dropout > 0, which also marks the
    grad-bearing path) takes the backward's optimum and the eval one the
    forward's. With the flat-2D streaming I/O the grad+dropout sweep
    measured bb=8: 7.26, bb=16: 5.10, bb=32: 4.70, bb=64: 5.69 ms —
    training defaults to the bb=32 budget. Env override:
    RECBOLE_TPU_TRM2_BUDGET (bytes)."""
    pad = lambda x, m: ((x + m - 1) // m) * m
    default = (20 if training else 10) * 1024 * 1024
    budget = int(os.environ.get("RECBOLE_TPU_TRM2_BUDGET", default))
    for cand in (128, 64, 32, 16, 8):
        if B % cand:
            continue
        rows = pad(cand * L, 8)
        Dp, Ip, Lp = pad(D, 128), pad(I, 128), pad(L, 128)
        score = cand * pad(L, 8) * Lp * 4
        est = (2 * H + 2) * score + 12 * rows * Dp * 4 + 3 * rows * Ip * 4
        if est <= budget:
            return cand
    return None


def fused_layer2_supported(B, H, L, D, inner, act):
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
    bb = _batch_block(B, H, L, D, I, training=(attn_rate > 0 or rate > 0))
    hd = D // H
    grid = (B // bb,)
    kw = {} if interpret else {"memory_space": pltpu.VMEM}
    x_spec = pl.BlockSpec((bb * L, D), lambda i: (i, 0), **kw)
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
                  eps=eps, attn_rate=attn_rate, rate=rate)
    cp = (None if interpret else
          pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=100 * 1024 * 1024))
    ckw = {} if interpret else {"compiler_params": cp}

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, **common),
        grid=grid,
        in_specs=[seed_spec, x_spec, valid_spec] + param_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B * L, D), jnp.float32),
        interpret=interpret, **ckw)
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, **common),
        grid=grid,
        in_specs=([seed_spec, x_spec, valid_spec] + param_specs + [x_spec]),
        out_specs=[x_spec] + grad_specs,
        out_shape=([jax.ShapeDtypeStruct((B * L, D), jnp.float32)]
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


def fused_transformer_layer2(x, layer_params, key_valid, seed, *, n_heads,
                             causal, act="gelu", eps=1e-12, dropout=0.0,
                             attn_dropout=0.0, interpret=False):
    """One reference TransformerLayer on (B, L, D) fp32 x, bf16 matmuls.

    layer_params: the models/layers.py transformer_init dict for one layer.
    key_valid: (B, L) int (1 = real key). seed: (1,) int32, ignored when
    both dropout rates are zero.
    """
    B, L, D = x.shape
    I = layer_params["ff1_w"].shape[1]
    fn = _make_layer(B, n_heads, L, D, I, bool(causal), act, float(eps),
                     float(attn_dropout), float(dropout), interpret)
    flat = []
    for k in PARAM_KEYS:
        v = layer_params[k]
        flat.append(v[None] if v.ndim == 1 else v)
    y = fn(x.astype(jnp.float32).reshape(B * L, D),
           key_valid.astype(jnp.int32), seed.astype(jnp.int32), *flat)
    return y.reshape(B, L, D)
