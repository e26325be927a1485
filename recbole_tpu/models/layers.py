"""Shared functional layers.

Parity target: reference layer library (recbole/model/layers.py) — MLPLayers,
FM machinery, Transformer encoder, attention blocks — re-expressed as
init/apply function pairs over plain pytrees. Everything is fixed-shape and
fusion-friendly; matmuls carry ``preferred_element_type`` so the MXU accumulates
in fp32 even when activations are bf16.
"""

import math

import jax
import jax.numpy as jnp

# ------------------------------------------------------------- initializers
# parity: recbole/model/init.py xavier_normal/xavier_uniform applied module-wide


def xavier_normal(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(rng, shape, dtype)


def xavier_uniform(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def normal_init(rng, shape, std=0.01, dtype=jnp.float32):
    return std * jax.random.normal(rng, shape, dtype)


def _fans(shape):
    if len(shape) == 1:
        return shape[0], shape[0]
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    return shape[1] * receptive, shape[0] * receptive


def torch_linear_uniform(rng, shape, dtype=jnp.float32):
    """torch nn.Linear's DEFAULT weight init — kaiming_uniform(a=sqrt(5)),
    which reduces to U(±1/sqrt(fan_in)). Our weights are stored (in, out),
    so fan_in = shape[0]. Models whose reference counterpart leaves Linear
    layers at torch defaults (e.g. NeuMF, neumf.py:101-103 only re-inits
    Embeddings) must use this, not xavier — the 2x scale difference moves
    the training trajectory measurably."""
    limit = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def torch_linear_bias(rng, fan_in, out_dim, dtype=jnp.float32):
    """torch nn.Linear default bias init: U(±1/sqrt(fan_in))."""
    limit = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(rng, (out_dim,), dtype, -limit, limit)


INITIALIZERS = {
    "xavier_normal": xavier_normal,
    "xavier_uniform": xavier_uniform,
    "normal": normal_init,
    "torch_linear": torch_linear_uniform,
}


# ------------------------------------------------------------------ embedding

def embedding_init(rng, num, dim, init="xavier_normal", dtype=jnp.float32):
    table = INITIALIZERS[init](rng, (num, dim), dtype)
    # row 0 is [PAD]; zero it so padded lookups contribute nothing
    return table.at[0].set(0.0)


def embed(table, ids):
    """Gather rows. XLA lowers this to a dynamic-gather that pipelines from HBM."""
    return jnp.take(table, ids, axis=0)


# ---------------------------------------------------------- mixed precision

def cast_compute(compute_dtype, *arrays):
    """Cast matmul operands to the compute dtype (bf16 feeds the MXU at full
    rate; fp32 inputs run the MXU in a multi-pass emulation). Params stay
    fp32 in memory; every dot below accumulates fp32 via
    ``preferred_element_type``, so this is standard mixed precision."""
    if compute_dtype is None:
        return arrays if len(arrays) > 1 else arrays[0]
    dt = jnp.dtype(compute_dtype)
    if dt == jnp.float32:
        return arrays if len(arrays) > 1 else arrays[0]
    out = tuple(a.astype(dt) for a in arrays)
    return out if len(out) > 1 else out[0]


def dot_c(x, w, compute_dtype=None):
    """jnp.dot with operands cast to the compute dtype, fp32 accumulation."""
    x, w = cast_compute(compute_dtype, x, w)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


# ------------------------------------------------------------------------ MLP

def activation(name):
    if callable(name):
        return name
    return {
        "sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh, "relu": jax.nn.relu,
        "leakyrelu": jax.nn.leaky_relu,
        # exact erf gelu — the reference's layers.gelu (layers.py:283) is the
        # erf form, not the tanh approximation jax defaults to
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "swish": jax.nn.swish, "none": lambda x: x, None: lambda x: x,
    }[name if name is None else name.lower()]


def bn_apply(x, g, b, w=None, eps=1e-5):
    """Batch normalization over axis 0 using BATCH statistics (torch
    train-mode semantics / track_running_stats=False). ``w`` masks padded
    scan rows out of the statistics. The reference's eval mode uses running
    averages instead; we normalize with the (large) eval batch's own stats —
    a documented deviation that avoids threading mutable state through the
    jitted step."""
    if w is None:
        mean = jnp.mean(x, 0)
        var = jnp.var(x, 0)
    else:
        wc = w[:, None]
        n = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(x * wc, 0) / n
        var = jnp.sum(((x - mean) ** 2) * wc, 0) / n
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def mlp_init(rng, layer_dims, init="xavier_normal", dtype=jnp.float32,
             bn=False):
    """parity: MLPLayers (layers.py:30); bn=True adds per-layer batch-norm
    scale/shift (the reference's bn=True MLPLayers)."""
    params = []
    for i in range(len(layer_dims) - 1):
        rng, wk = jax.random.split(rng)
        if init == "torch_linear":
            rng, bk = jax.random.split(rng)
            b = torch_linear_bias(bk, layer_dims[i], layer_dims[i + 1], dtype)
        else:
            b = jnp.zeros((layer_dims[i + 1],), dtype)
        layer = {
            "w": INITIALIZERS[init](wk, (layer_dims[i], layer_dims[i + 1]), dtype),
            "b": b,
        }
        if bn:
            layer["bn_g"] = jnp.ones((layer_dims[i + 1],), dtype)
            layer["bn_b"] = jnp.zeros((layer_dims[i + 1],), dtype)
        params.append(layer)
    return params


def mlp_apply(params, x, act="relu", dropout=0.0, rng=None, final_act=True,
              compute_dtype=None, bn_w=None):
    """Reference MLPLayers order per layer: dropout → linear → [batchnorm] →
    activation (layers.py:62-78). Layers carrying bn_g/bn_b (mlp_init
    bn=True) get batch-stat normalization; bn_w masks padded scan rows."""
    fn = activation(act)
    n = len(params)
    for i, layer in enumerate(params):
        if dropout > 0.0 and rng is not None:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, dropout)
        x = dot_c(x, layer["w"], compute_dtype) + layer["b"]
        if "bn_g" in layer:
            x = bn_apply(x, layer["bn_g"], layer["bn_b"], w=bn_w)
        if final_act or i < n - 1:
            x = fn(x)
    return x


def dropout_apply(rng, x, rate):
    keep = 1.0 - rate
    # RECBOLE_TPU_DROPOUT_SHAPE picks the rng tensor shape for A/B probing
    # (the TPU rng custom-call's output layout differs by rank and drags
    # neighbors through layout copies — round-4 xplane trace): "flat" 1-D,
    # "2d" (rows, lastdim), default: x.shape
    import os
    variant = os.environ.get("RECBOLE_TPU_DROPOUT_SHAPE", "")
    if variant == "flat":
        mask = jax.random.bernoulli(rng, keep, (x.size,)).reshape(x.shape)
    elif variant == "2d":
        mask = jax.random.bernoulli(
            rng, keep, (x.size // x.shape[-1], x.shape[-1])).reshape(x.shape)
    else:
        mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ------------------------------------------------------------ factorization

def fm_pairwise(emb):
    """Second-order FM interaction: 0.5 * ((sum v)^2 - sum v^2), summed over dim.

    parity: BaseFactorizationMachine (layers.py:147).
    emb: (B, F, D) -> (B,) (or (B, D) with reduce=False semantics inlined by callers)
    """
    sum_sq = jnp.square(jnp.sum(emb, axis=1))
    sq_sum = jnp.sum(jnp.square(emb), axis=1)
    return 0.5 * jnp.sum(sum_sq - sq_sum, axis=-1)


# ------------------------------------------------------------------------ GRU

def gru_init(rng, input_size, hidden_size, n_layers=1, dtype=jnp.float32):
    """Multi-layer GRU parameters (gates ordered r, z, n — torch convention,
    matching the reference's nn.GRU semantics)."""
    layers = []
    for li in range(n_layers):
        in_dim = input_size if li == 0 else hidden_size
        rng, k1, k2 = jax.random.split(rng, 3)
        layers.append({
            "wi": xavier_uniform(k1, (in_dim, 3 * hidden_size), dtype),
            "wh": xavier_uniform(k2, (hidden_size, 3 * hidden_size), dtype),
            "bi": jnp.zeros((3 * hidden_size,), dtype),
            "bh": jnp.zeros((3 * hidden_size,), dtype),
        })
    return layers


def gru_apply(params, x, h0=None, compute_dtype=None, fused=None):
    """x: (B, L, D) -> outputs (B, L, H) of the last layer.

    The input projection is one big batched MXU matmul; the recurrence is a
    lax.scan. The recurrence is HBM-BANDWIDTH bound at catalog shapes
    (B=8192 vs 2048 barely changed the ml-1m epoch), so the two levers are
    traffic reduction: (1) xi and the per-step outputs ride the bf16
    compute dtype (gate math upcasts to fp32 in-register; the fp32 hidden
    carry is preserved across steps so recurrent error does not compound);
    (2) jax.checkpoint on the step makes the backward recompute the gates
    instead of storing (B, 3H) residuals per timestep — flops are free here,
    bandwidth is not. Measured ml-1m GRU4Rec epoch: 2.77s base, 2.32s bf16,
    2.21s checkpoint, 1.62s both.

    ``fused=True`` opts into the Pallas kernel (ops/fused_gru.py: whole time
    loop in VMEM, recompute-based backward) — measured at ml-1m shape it
    does NOT beat XLA's scan, so the default stays on XLA.

    NOTE: unroll>1 measured SLOWER (2.76s unroll=1, 3.23s unroll=2, 3.98s
    unroll=10) — unrolling bloats the while-loop working set without
    removing the sequential dependency.
    """
    B, L, _ = x.shape
    for layer in params:
        H = layer["wh"].shape[0]
        h_init = (jnp.zeros((B, H), jnp.float32) if h0 is None
                  else h0.astype(jnp.float32))

        xi = dot_c(x, layer["wi"], compute_dtype) + layer["bi"]  # (B, L, 3H)

        if fused:
            from ..ops.fused_gru import fused_gru, fused_gru_supported
            if fused_gru_supported(B, L, H):
                x = fused_gru(xi, h_init.astype(jnp.float32),
                              layer["wh"], layer["bh"])
                continue

        if compute_dtype is not None:
            xi = xi.astype(compute_dtype)

        @jax.checkpoint
        def step(h, xi_t, _layer=layer):
            hh = dot_c(h, _layer["wh"], compute_dtype) + _layer["bh"]
            ir, iz, in_ = jnp.split(xi_t.astype(jnp.float32), 3, axis=-1)
            hr, hz, hn = jnp.split(hh, 3, axis=-1)
            r = jax.nn.sigmoid(ir + hr)
            z = jax.nn.sigmoid(iz + hz)
            n = jnp.tanh(in_ + r * hn)
            h_new = (1 - z) * n + z * h
            out = (h_new.astype(compute_dtype) if compute_dtype is not None
                   else h_new)
            return h_new, out

        _, outs = jax.lax.scan(step, h_init, xi.transpose(1, 0, 2))
        x = outs.transpose(1, 0, 2)
    return x


# --------------------------------------------------------------- transformer

def transformer_init(rng, n_layers, n_heads, hidden, inner, dtype=jnp.float32):
    """parity: TransformerEncoder (layers.py:499) used by SASRec/BERT4Rec/..."""
    layers = []
    for _ in range(n_layers):
        rng, *ks = jax.random.split(rng, 8)
        layers.append({
            "wq": xavier_uniform(ks[0], (hidden, hidden), dtype),
            "wk": xavier_uniform(ks[1], (hidden, hidden), dtype),
            "wv": xavier_uniform(ks[2], (hidden, hidden), dtype),
            "wo": xavier_uniform(ks[3], (hidden, hidden), dtype),
            "bq": jnp.zeros((hidden,), dtype), "bk": jnp.zeros((hidden,), dtype),
            "bv": jnp.zeros((hidden,), dtype), "bo": jnp.zeros((hidden,), dtype),
            "ln1_g": jnp.ones((hidden,), dtype), "ln1_b": jnp.zeros((hidden,), dtype),
            "ln2_g": jnp.ones((hidden,), dtype), "ln2_b": jnp.zeros((hidden,), dtype),
            "ff1_w": xavier_uniform(ks[4], (hidden, inner), dtype),
            "ff1_b": jnp.zeros((inner,), dtype),
            "ff2_w": xavier_uniform(ks[5], (inner, hidden), dtype),
            "ff2_b": jnp.zeros((hidden,), dtype),
        })
    return layers


def layer_norm(x, g, b, eps=1e-12):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def transformer_apply(params, x, attn_mask, n_heads, act="gelu",
                      dropout=0.0, attn_dropout=0.0, rng=None,
                      compute_dtype=None, mask_spec=None, fused=False):
    """x: (B, L, D); attn_mask: (B, 1, L, L) additive (-inf for blocked).

    Post-LN residual blocks matching the reference TransformerLayer
    (layers.py:469): attention -> add&norm -> FFN -> add&norm. With a bf16
    compute dtype the attention probabilities and dropout masks also ride
    bf16 (the (B,H,L,L) score tensor is the bandwidth hot spot); softmax
    normalization and LayerNorm statistics stay fp32.

    ``mask_spec=(key_valid, causal)`` — key_valid (B, L) — enables the
    fused Pallas attention path (``fused=True`` on TPU): mask build,
    softmax, dropout (TPU hardware PRNG) and both attention matmuls run in
    one kernel and the (B,H,L,L) tensors never reach HBM. ``attn_mask`` may
    be None in that case; anything unsupported falls back to the XLA path.
    """
    fn = activation(act)
    use_fused = False
    if fused == "layer2" and mask_spec is not None and not callable(act):
        # round-5 whole-layer bf16 Pallas kernel (ops/trm_layer.py):
        # masked-head attention (no lane slicing) + flat 2D HBM streaming
        # (the 3D (bb, L, 64) block DMA measured 36 GB/s — 60x slower than
        # the same bytes as 2D rows). Matches the bf16 XLA path modulo
        # dropout RNG streams.
        from ..ops.trm_layer import (fused_transformer_layer2,
                                     fused_layer2_supported)
        B, L, D = x.shape
        inner = params[0]["ff1_w"].shape[1] if params else 0
        if params and fused_layer2_supported(B, n_heads, L, D, inner, act):
            key_valid, causal = mask_spec
            if rng is not None and (dropout > 0.0 or attn_dropout > 0.0):
                rng, sk = jax.random.split(rng)
                seed = jax.random.bits(sk, (1,), "uint32").astype(jnp.int32)
                dr, adr = dropout, attn_dropout
            else:
                seed = jnp.zeros((1,), jnp.int32)
                dr = adr = 0.0
            for li, layer in enumerate(params):
                # stride layer seeds so per-(layer, block) streams differ
                x = fused_transformer_layer2(
                    x, layer, key_valid, seed + li * (1 << 20),
                    n_heads=n_heads, causal=causal, act=act,
                    dropout=dr, attn_dropout=adr)
            return x
    if fused == "layer" and mask_spec is not None and compute_dtype is None \
            and not callable(act):
        # whole-layer Pallas kernel — opt-in via fused_attention: "layer".
        # Measured at ml-1m SASRec shape it does NOT beat XLA (3.1 vs 2.6 ms
        # fwd, 8.2 vs 5.0 ms fwd+bwd per layer): with L=50/D=64 operands the
        # MXU tiles are mostly padding whichever way the layer is scheduled,
        # and XLA's own elementwise fusion already collapses the chain. Kept
        # as the pinned-correct single-dispatch reference for larger-D
        # configs (see ops/fused_transformer.py).
        from ..ops.fused_transformer import (fused_transformer_layer,
                                             fused_layer_supported)
        B, L, D = x.shape
        inner = params[0]["ff1_w"].shape[1] if params else 0
        if params and fused_layer_supported(B, n_heads, L, D, inner, act):
            key_valid, causal = mask_spec
            if rng is not None and (dropout > 0.0 or attn_dropout > 0.0):
                rng, sk = jax.random.split(rng)
                seed = jax.random.bits(sk, (1,), "uint32").astype(jnp.int32)
                dr, adr = dropout, attn_dropout
            else:
                seed = jnp.zeros((1,), jnp.int32)
                dr = adr = 0.0
            for li, layer in enumerate(params):
                # stride layer seeds so per-(layer, block) streams differ
                x = fused_transformer_layer(
                    x, layer, key_valid, seed + li * (1 << 20),
                    n_heads=n_heads, causal=causal, act=act,
                    dropout=dr, attn_dropout=adr)
            return x
    if fused and mask_spec is not None:
        from ..ops.fused_attention import (fused_attention,
                                           fused_attention_supported)
        B, L, D = x.shape
        use_fused = fused_attention_supported(B, n_heads, L, D // n_heads)
    if use_fused:
        key_valid, causal = mask_spec
        if rng is not None and attn_dropout > 0.0:
            rng, sk = jax.random.split(rng)
            seed = jax.random.bits(sk, (1,), "uint32").astype(jnp.int32)
        else:
            seed = jnp.zeros((1,), jnp.int32)
    elif attn_mask is None:
        key_valid, causal = mask_spec
        attn_mask = (causal_attention_mask_from_valid(key_valid) if causal
                     else bidirectional_attention_mask(key_valid > 0))
    for li, layer in enumerate(params):
        B, L, D = x.shape
        hd = D // n_heads

        if use_fused:
            q = (dot_c(x, layer["wq"], compute_dtype) + layer["bq"]) \
                .reshape(B, L, n_heads, hd)
            k = (dot_c(x, layer["wk"], compute_dtype) + layer["bk"]) \
                .reshape(B, L, n_heads, hd)
            v = (dot_c(x, layer["wv"], compute_dtype) + layer["bv"]) \
                .reshape(B, L, n_heads, hd)
            rate = attn_dropout if rng is not None else 0.0
            # stride layers by 2^20 so (layer, batch-block) seed pairs never
            # collide: the kernel adds program_id (< #blocks << 2^20) to the
            # seed, and seed+li would replay layer li+1's stream on block b-1
            ctx = fused_attention(q, k, v, key_valid, seed + li * (1 << 20),
                                  causal=causal, dropout_rate=rate)
            ctx = ctx.reshape(B, L, D)
        else:
            # no explicit head transpose: contract straight from the
            # (B, L, H, hd) projection layout — the .transpose(0,2,1,3)
            # form materialized extra layout copies of q/k/v and ctx
            # (round-4 xplane trace)
            def proj(w, b):
                return (dot_c(x, w, compute_dtype) + b) \
                    .reshape(B, L, n_heads, hd)

            q = proj(layer["wq"], layer["bq"])
            k = proj(layer["wk"], layer["bk"])
            v = proj(layer["wv"], layer["bv"])
            q, k = cast_compute(compute_dtype, q, k)
            scores = jnp.einsum(
                "blhd,bmhd->bhlm", q, k,
                preferred_element_type=jnp.float32) / math.sqrt(hd)
            scores = scores + attn_mask
            probs = jax.nn.softmax(scores, axis=-1)
            if attn_dropout > 0.0 and rng is not None:
                rng, dk = jax.random.split(rng)
                probs = dropout_apply(dk, probs, attn_dropout)
            probs, v = cast_compute(compute_dtype, probs, v)
            ctx = jnp.einsum("bhlm,bmhd->blhd", probs, v,
                             preferred_element_type=jnp.float32)
            ctx = ctx.reshape(B, L, D)
        attn_out = dot_c(ctx, layer["wo"], compute_dtype) + layer["bo"]
        if dropout > 0.0 and rng is not None:
            rng, dk = jax.random.split(rng)
            attn_out = dropout_apply(dk, attn_out, dropout)
        x = layer_norm(x + attn_out, layer["ln1_g"], layer["ln1_b"])

        h_in = dot_c(x, layer["ff1_w"], compute_dtype) + layer["ff1_b"]
        if compute_dtype is not None:
            # activation in compute dtype, so the (B, L, inner) residual
            # autodiff saves for ff2's backward is bf16, not f32 (~105MB
            # at ml-1m SASRec shape — round-4 trace fusion.474/475)
            h_in = h_in.astype(compute_dtype)
        h = fn(h_in)
        h = dot_c(h, layer["ff2_w"], compute_dtype) + layer["ff2_b"]
        if dropout > 0.0 and rng is not None:
            rng, dk = jax.random.split(rng)
            h = dropout_apply(dk, h, dropout)
        x = layer_norm(x + h, layer["ln2_g"], layer["ln2_b"])
    return x


def causal_attention_mask(seq_len_1d, L):
    """(B,1,L,L) additive mask: causal AND key-padding
    (parity: SASRec get_attention_mask, sasrec.py:92-106)."""
    causal = jnp.tril(jnp.ones((L, L), jnp.bool_))
    key_valid = jnp.arange(L)[None, :] < seq_len_1d[:, None]          # (B, L)
    mask = causal[None, :, :] & key_valid[:, None, :]
    return jnp.where(mask, 0.0, -1e9)[:, None, :, :]


def causal_attention_mask_from_valid(key_valid):
    """Same as causal_attention_mask but from a (B, L) validity mask."""
    L = key_valid.shape[1]
    causal = jnp.tril(jnp.ones((L, L), jnp.bool_))
    mask = causal[None, :, :] & (key_valid[:, None, :] > 0)
    return jnp.where(mask, 0.0, -1e9)[:, None, :, :]


def bidirectional_attention_mask(seq_valid):
    """(B,1,L,L) additive mask from a (B,L) validity mask (BERT4Rec-style)."""
    mask = seq_valid[:, None, :] & seq_valid[:, :, None]
    return jnp.where(mask, 0.0, -1e9)[:, None, :, :]
