"""Fused multi-head attention Pallas kernel for short-sequence recommenders.

The reference's TransformerEncoder (recbole/model/layers.py:469-540) runs
attention as separate matmul / mask-add / softmax / dropout / matmul torch
ops. The XLA translation of that graph materializes the (B, H, L, L) score
tensor in HBM four-plus times per layer (scores, softmax, dropout bits with
a layout copy out of the hardware RNG, probs) — profiling SASRec at ml-1m
shape shows those round-trips plus the dropout-mask generation dominating
the train step, not MXU FLOPs.

Sequence models in this catalog are short (MAX_ITEM_LIST_LENGTH default 50),
so a whole attention row fits in VMEM with room to spare — no online-softmax
/ flash machinery needed. This kernel fuses, per batch block:

    scores = q @ k^T * scale  ->  +mask (built in-kernel from seq lengths,
    the (B,H,L,L) mask never exists in HBM)  ->  softmax  ->  dropout
    (pltpu.prng_random_bits, seeded per block)  ->  probs @ v

into ONE kernel: HBM traffic is exactly read(q,k,v,valid) + write(out).
The backward kernel recomputes scores/probs from q,k,v and REGENERATES the
dropout mask from the same per-block seed instead of storing it, then forms
dq, dk, dv with the standard softmax-backward identity. Batch blocks are
independent, so no cross-grid accumulation is needed.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _build_mask(valid_ref, bb, L, causal):
    """(bb, L, L) additive mask from the (bb, L) key-validity block
    (shared across heads; heads are looped statically in the kernel)."""
    key_ok = valid_ref[:][:, None, :] > 0                # (bb, 1, L)
    if causal:
        ql = jax.lax.broadcasted_iota(jnp.int32, (bb, L, L), 1)
        kl = jax.lax.broadcasted_iota(jnp.int32, (bb, L, L), 2)
        key_ok = key_ok & (kl <= ql)
    return jnp.where(key_ok, 0.0, NEG)


def _dropout_bits(shape, rate):
    """Keep-mask from the per-core PRNG (seeded by the caller).

    prng_random_bits returns int32 — bitcast to uint32 before comparing,
    otherwise the threshold wraps and the mask degenerates."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return bits >= threshold                             # True -> keep


def _softmax(scores):
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _bmm(a, b, contract_a, contract_b):
    """Single-batch-dim dot_general (Mosaic's tpu.matmul limit).

    Operands stay fp32: at these shapes (50x32 per batch element) the
    kernel is VPU/layout-bound, and bf16 casts measurably SLOW it down
    (2.0 -> 2.5 ms/iter measured on v5e) — the MXU is nowhere near the
    roofline either way."""
    return jax.lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, valid_ref, o_ref, *,
                causal, rate, scale, bb, H, L, hd):
    mask = _build_mask(valid_ref, bb, L, causal)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    for h in range(H):                                   # static unroll
        q = q_ref[:, :, h, :]
        k = k_ref[:, :, h, :]
        v = v_ref[:, :, h, :]                            # (bb, L, hd)
        scores = _bmm(q, k, 2, 2) * scale + mask         # (bb, L, L)
        probs = _softmax(scores)
        if rate > 0.0:
            keep = _dropout_bits((bb, L, L), rate)
            probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
        o_ref[:, :, h, :] = _bmm(probs, v, 2, 1)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, valid_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *,
                causal, rate, scale, bb, H, L, hd):
    mask = _build_mask(valid_ref, bb, L, causal)
    if rate > 0.0:
        # same seed as forward -> the per-head bit streams replay in order
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    for h in range(H):
        q = q_ref[:, :, h, :]
        k = k_ref[:, :, h, :]
        v = v_ref[:, :, h, :]
        do = do_ref[:, :, h, :]                          # (bb, L, hd)
        scores = _bmm(q, k, 2, 2) * scale + mask
        probs = _softmax(scores)                         # pre-dropout P

        # dP_dropped = dO @ V^T ; undo dropout with the regenerated mask
        dpd = _bmm(do, v, 2, 2)                          # (bb, L, L)
        if rate > 0.0:
            keep = _dropout_bits((bb, L, L), rate)
            dp = jnp.where(keep, dpd / (1.0 - rate), 0.0)
            pd = jnp.where(keep, probs / (1.0 - rate), 0.0)
        else:
            dp, pd = dpd, probs

        # softmax backward: dS = P * (dP - sum_j dP*P)
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        ds *= scale

        dq_ref[:, :, h, :] = _bmm(ds, k, 2, 1)
        dk_ref[:, :, h, :] = _bmm(ds, q, 1, 1)
        dv_ref[:, :, h, :] = _bmm(pd, do, 1, 1)


def _batch_block(B, H, L):
    """Largest batch block that divides B and fits VMEM.

    The live set is ~5 (bb*H, L, L) f32 temporaries (scores/probs/bits/
    dropout/keep) at PADDED tile sizes — sublanes round to 8, lanes to 128 —
    plus the q/k/v/o blocks; budget the score term to ~1.5MB so the whole
    kernel stays under the 16MB scoped-VMEM limit."""
    pad = lambda x, m: ((x + m - 1) // m) * m
    budget = int(os.environ.get("RECBOLE_TPU_ATTN_BUDGET", 1536 * 1024))
    for cand in (64, 32, 16, 8):
        if B % cand == 0 and cand * H * pad(L, 8) * pad(L, 128) * 4 <= budget:
            return cand
    return None


def _specs(bb, H, L, hd, interpret):
    kw = {} if interpret else {"memory_space": pltpu.VMEM}
    qkv = pl.BlockSpec((bb, L, H, hd), lambda i: (i, 0, 0, 0), **kw)
    valid = pl.BlockSpec((bb, L), lambda i: (i, 0), **kw)
    skw = {} if interpret else {"memory_space": pltpu.SMEM}
    seed = pl.BlockSpec((1,), lambda i: (0,), **skw)
    return seed, qkv, valid


@functools.lru_cache(maxsize=None)
def _make_attention(causal, rate, scale, B, H, L, hd, interpret):
    bb = _batch_block(B, H, L)
    grid = (B // bb,)
    seed_spec, qkv_spec, valid_spec = _specs(bb, H, L, hd, interpret)
    common = dict(causal=causal, rate=rate, scale=scale,
                  bb=bb, H=H, L=L, hd=hd)

    cp = (None if interpret else
          pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=100 * 1024 * 1024))
    kw = {} if interpret else {"compiler_params": cp}
    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, **common),
        grid=grid,
        in_specs=[seed_spec, qkv_spec, qkv_spec, qkv_spec, valid_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, H, hd), jnp.float32),
        interpret=interpret, **kw,
    )
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, **common),
        grid=grid,
        in_specs=[seed_spec, qkv_spec, qkv_spec, qkv_spec, valid_spec,
                  qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_shape=[jax.ShapeDtypeStruct((B, L, H, hd), jnp.float32)] * 3,
        interpret=interpret, **kw,
    )

    @jax.custom_vjp
    def attn(q, k, v, key_valid, seed):
        return fwd_call(seed, q, k, v, key_valid)

    def fwd(q, k, v, key_valid, seed):
        return attn(q, k, v, key_valid, seed), (q, k, v, key_valid, seed)

    def bwd(res, do):
        q, k, v, key_valid, seed = res
        dq, dk, dv = bwd_call(seed, q, k, v, key_valid, do)
        return dq, dk, dv, None, None

    attn.defvjp(fwd, bwd)
    return attn


def fused_attention_supported(B, H, L, hd):
    """The kernel runs real batches on TPU; anything else uses XLA."""
    return (jax.default_backend() in ("tpu", "axon")
            and _batch_block(B, H, L) is not None)


def fused_attention(q, k, v, key_valid, seed, *, causal=True,
                    dropout_rate=0.0, scale=None, interpret=False):
    """q/k/v: (B, L, H, hd) f32 — the natural reshape of a (B, L, D)
    projection, NO head transpose needed; key_valid: (B, L) int32 (1 = real
    key); seed: (1,) int32 (ignored when dropout_rate == 0).
    Returns (B, L, H, hd).

    Rows at padded query positions attend over a fully-masked row and come
    out uniform — identical to the XLA path; callers only read real
    positions (gather_last).
    """
    B, L, H, hd = q.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(hd))
    attn = _make_attention(bool(causal), float(dropout_rate), float(scale),
                           B, H, L, hd, interpret)
    return attn(q, k, v, key_valid.astype(jnp.int32),
                seed.astype(jnp.int32))


def attention_xla(q, k, v, key_valid, *, causal=True, scale=None):
    """Reference XLA path used for kernel correctness tests (no dropout).
    Same (B, L, H, hd) layout as the kernel."""
    B, L, H, hd = q.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(hd))
    scores = jnp.einsum("blhd,bmhd->bhlm", q, k,
                        preferred_element_type=jnp.float32) * scale
    ok = key_valid[:, None, None, :] > 0
    if causal:
        ql = jnp.arange(L)[:, None]
        kl = jnp.arange(L)[None, :]
        ok = ok & (kl <= ql)[None, None]
    scores = jnp.where(ok, scores, NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v,
                      preferred_element_type=jnp.float32)
