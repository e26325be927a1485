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


INITIALIZERS = {
    "xavier_normal": xavier_normal,
    "xavier_uniform": xavier_uniform,
    "normal": normal_init,
}


# ------------------------------------------------------------------ embedding

def embedding_init(rng, num, dim, init="xavier_normal", dtype=jnp.float32):
    table = INITIALIZERS[init](rng, (num, dim), dtype)
    # row 0 is [PAD]; zero it so padded lookups contribute nothing
    return table.at[0].set(0.0)


def embed(table, ids):
    """Gather rows. XLA lowers this to a dynamic-gather that pipelines from HBM."""
    return jnp.take(table, ids, axis=0)


# ------------------------------------------------------------------------ MLP

def activation(name):
    return {
        "sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh, "relu": jax.nn.relu,
        "leakyrelu": jax.nn.leaky_relu, "gelu": jax.nn.gelu,
        "swish": jax.nn.swish, "none": lambda x: x, None: lambda x: x,
    }[name if name is None else name.lower()]


def mlp_init(rng, layer_dims, init="xavier_normal", dtype=jnp.float32):
    """parity: MLPLayers (layers.py:30)."""
    params = []
    for i in range(len(layer_dims) - 1):
        rng, wk = jax.random.split(rng)
        params.append({
            "w": INITIALIZERS[init](wk, (layer_dims[i], layer_dims[i + 1]), dtype),
            "b": jnp.zeros((layer_dims[i + 1],), dtype),
        })
    return params


def mlp_apply(params, x, act="relu", dropout=0.0, rng=None, final_act=True):
    fn = activation(act)
    n = len(params)
    for i, layer in enumerate(params):
        if dropout > 0.0 and rng is not None:
            rng, dk = jax.random.split(rng)
            x = dropout_apply(dk, x, dropout)
        x = jnp.dot(x, layer["w"], preferred_element_type=jnp.float32) + layer["b"]
        if final_act or i < n - 1:
            x = fn(x)
    return x


def dropout_apply(rng, x, rate):
    keep = 1.0 - rate
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


def gru_apply(params, x, h0=None):
    """x: (B, L, D) -> outputs (B, L, H) of the last layer.

    lax.scan over time; each gate matmul is batched on the MXU.
    """
    B, L, _ = x.shape
    for layer in params:
        H = layer["wh"].shape[0]
        h_init = jnp.zeros((B, H), x.dtype) if h0 is None else h0

        xi = jnp.dot(x, layer["wi"], preferred_element_type=jnp.float32) \
            + layer["bi"]                                      # (B, L, 3H)

        def step(h, xi_t):
            hh = jnp.dot(h, layer["wh"],
                         preferred_element_type=jnp.float32) + layer["bh"]
            ir, iz, in_ = jnp.split(xi_t, 3, axis=-1)
            hr, hz, hn = jnp.split(hh, 3, axis=-1)
            r = jax.nn.sigmoid(ir + hr)
            z = jax.nn.sigmoid(iz + hz)
            n = jnp.tanh(in_ + r * hn)
            h_new = (1 - z) * n + z * h
            return h_new, h_new

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
                      dropout=0.0, attn_dropout=0.0, rng=None):
    """x: (B, L, D); attn_mask: (B, 1, L, L) additive (-inf for blocked).

    Post-LN residual blocks matching the reference TransformerLayer
    (layers.py:469): attention -> add&norm -> FFN -> add&norm.
    """
    fn = activation(act)
    for layer in params:
        B, L, D = x.shape
        hd = D // n_heads

        def proj(w, b):
            return (jnp.dot(x, w, preferred_element_type=jnp.float32) + b) \
                .reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)

        q = proj(layer["wq"], layer["bq"])
        k = proj(layer["wk"], layer["bk"])
        v = proj(layer["wv"], layer["bv"])
        scores = jnp.einsum("bhld,bhmd->bhlm", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        scores = scores + attn_mask
        probs = jax.nn.softmax(scores, axis=-1)
        if attn_dropout > 0.0 and rng is not None:
            rng, dk = jax.random.split(rng)
            probs = dropout_apply(dk, probs, attn_dropout)
        ctx = jnp.einsum("bhlm,bhmd->bhld", probs, v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, D)
        attn_out = jnp.dot(ctx, layer["wo"],
                           preferred_element_type=jnp.float32) + layer["bo"]
        if dropout > 0.0 and rng is not None:
            rng, dk = jax.random.split(rng)
            attn_out = dropout_apply(dk, attn_out, dropout)
        x = layer_norm(x + attn_out, layer["ln1_g"], layer["ln1_b"])

        h = fn(jnp.dot(x, layer["ff1_w"],
                       preferred_element_type=jnp.float32) + layer["ff1_b"])
        h = jnp.dot(h, layer["ff2_w"],
                    preferred_element_type=jnp.float32) + layer["ff2_b"]
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


def bidirectional_attention_mask(seq_valid):
    """(B,1,L,L) additive mask from a (B,L) validity mask (BERT4Rec-style)."""
    mask = seq_valid[:, None, :] & seq_valid[:, :, None]
    return jnp.where(mask, 0.0, -1e9)[:, None, :, :]
