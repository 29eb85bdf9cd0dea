"""Fused attention Pallas kernel WITH in-kernel weight dropout.

Why: with reference-parity attention-weight dropout
(``attention.py:17``), the XLA path materialises the (B, H, T, T) weight
tensor AND a same-shaped dropout mask in HBM every step — measured at
~10 ms of a 52 ms flagship step on v5e. Flash attention kernels don't
support weight dropout; this kernel does.

Design (speech-length specialised): utterance buckets give T ≤ ~768, so a
WHOLE (T, T) score tile fits VMEM — no online softmax, no KV tiling. One
grid cell per (batch, head):

- fwd: S = QK^T·scale + key-length bias → row softmax → dropout mask from
  the on-core PRNG (seeded per (seed, b, h) — deterministic) → (W∘M) @ V.
  Nothing but the (T, D) output leaves the core.
- bwd (custom VJP): recomputes S/W and regenerates the SAME mask from the
  same seed, then dV = (W∘M)^T dO, dW = (dO V^T)∘M, dS = W∘(dW − rowsum
  (dW∘W)), dQ = dS K·scale, dK = dS^T Q·scale. No residuals beyond the
  inputs — backward memory stays O(T·D).

Falls back to interpret mode off-TPU (TPU PRNG emulated), so CPU tests
cover the full path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret():
    """Off-TPU, use the TPU-emulating interpreter (plain interpret mode
    lacks the TPU PRNG primitives)."""
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams()


def _softmax_masked(s, n):
    """Row softmax of (T, T) scores with key-length bias; zeroes padded
    query rows. ``n``: this row's valid length (scalar)."""
    t = s.shape[0]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    s = s + jnp.where(kpos < n, 0.0, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    return w * (qpos < n).astype(jnp.float32)


def _keep_mask(seed_ref, rate: float, shape):
    """Deterministic dropout keep-mask (scaled by 1/keep_prob).

    Counter-based: murmur3-style finalizer hashed from the ELEMENT INDEX
    plus (seed, grid cell). The hardware PRNG (pltpu.prng_random_bits)
    is NOT used: Mosaic may assign its bit stream to vector lanes
    differently in different kernels, so a regenerate-in-backward design
    cannot rely on it — an index-keyed hash is bit-identical in fwd and
    bwd by construction (and works under the CPU interpreter)."""
    cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    seed = seed_ref[0, 0].astype(jnp.uint32)
    x = (
        i * jnp.uint32(0x9E3779B9)
        ^ j * jnp.uint32(0x85EBCA6B)
        ^ (seed * jnp.uint32(0xC2B2AE35) + cell.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F))
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return (x >= threshold).astype(jnp.float32) / (1.0 - rate)


def _fwd_kernel(q_ref, k_ref, v_ref, len_ref, seed_ref, o_ref, *, scale, rate):
    # keep matmul INPUTS in the storage dtype (bf16 on the fast path) and
    # accumulate f32 on the MXU — casting inputs to f32 would force the
    # 4x-slower f32 MXU mode
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    w = _softmax_masked(s, len_ref[pl.program_id(0), 0])
    if rate > 0.0:
        w = w * _keep_mask(seed_ref, rate, s.shape)
    o_ref[0, 0] = jnp.dot(
        w.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, len_ref, seed_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, scale, rate,
):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    w = _softmax_masked(s, len_ref[pl.program_id(0), 0])
    if rate > 0.0:
        keep = _keep_mask(seed_ref, rate, s.shape)
        wd = w * keep
    else:
        keep = None
        wd = w
    dv_ref[0, 0] = jax.lax.dot_general(
        wd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dwd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw = dwd * keep if keep is not None else dwd
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    ds_low = ds.astype(q.dtype)
    dq_ref[0, 0] = (
        jnp.dot(ds_low, k, preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] = (
        jax.lax.dot_general(
            ds_low, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    ).astype(dk_ref.dtype)


def _pad4(x, t_pad, d_pad):
    return jnp.pad(
        x, ((0, 0), (0, 0), (0, t_pad - x.shape[2]), (0, d_pad - x.shape[3]))
    )


def _make_specs(t_pad, d_pad, bsz):
    qkv = pl.BlockSpec(
        (1, 1, t_pad, d_pad), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    # SMEM blocks must equal the array dims; kernels index by program_id
    length = pl.BlockSpec((bsz, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM)
    seed = pl.BlockSpec((1, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM)
    return qkv, length, seed


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention(q, k, v, lengths, seed, scale: float, dropout_rate: float):
    """q/k/v: (B, H, T, D); lengths: (B,) valid positions; seed: scalar
    int32 (vary per step for fresh dropout). Returns (B, H, T, D).
    ``dropout_rate`` 0.0 = eval path."""
    out, _ = _vjp_fwd(q, k, v, lengths, seed, scale, dropout_rate)
    return out


def _vjp_fwd(q, k, v, lengths, seed, scale, rate):
    bsz, heads, t, d = q.shape
    # T only needs sublane (8) alignment — padding to 128 wastes up to 44%
    # of the (T, T) score work at speech lengths (267 -> 384 vs 272)
    t_pad, d_pad = max(_round_up(t, 8), 128), _round_up(d, 128)
    qkv_spec, len_spec, seed_spec = _make_specs(t_pad, d_pad, bsz)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate),
        grid=(bsz, heads),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, len_spec, seed_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, heads, t_pad, d_pad), q.dtype),
        interpret=_interpret(),
    )(
        _pad4(q, t_pad, d_pad),
        _pad4(k, t_pad, d_pad),
        _pad4(v, t_pad, d_pad),
        lengths.astype(jnp.int32).reshape(bsz, 1),
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
    )
    return out[:, :, :t, :d], (q, k, v, lengths, seed)


def _vjp_bwd(scale, rate, res, g):
    q, k, v, lengths, seed = res
    bsz, heads, t, d = q.shape
    t_pad, d_pad = max(_round_up(t, 8), 128), _round_up(d, 128)
    qkv_spec, len_spec, seed_spec = _make_specs(t_pad, d_pad, bsz)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate),
        grid=(bsz, heads),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, len_spec, seed_spec, qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((bsz, heads, t_pad, d_pad), q.dtype)
            for _ in range(3)
        ),
        interpret=_interpret(),
    )(
        _pad4(q, t_pad, d_pad),
        _pad4(k, t_pad, d_pad),
        _pad4(v, t_pad, d_pad),
        lengths.astype(jnp.int32).reshape(bsz, 1),
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
        _pad4(g, t_pad, d_pad),
    )
    crop = lambda x: x[:, :, :t, :d]
    return crop(dq), crop(dk), crop(dv), None, None


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)


def _xla_keep_mask(seed, bsz, heads, t, rate):
    """Plain-jnp replica of the kernel's index-hash dropout mask
    (``_keep_mask``): bit-identical for element (b, h, i, j) because the
    hash is keyed on indices, not on a sequential PRNG stream."""
    cell = (
        jnp.arange(bsz, dtype=jnp.uint32)[:, None] * jnp.uint32(heads)
        + jnp.arange(heads, dtype=jnp.uint32)[None, :]
    )  # (B, H)
    i = jnp.arange(t, dtype=jnp.uint32)[:, None]
    j = jnp.arange(t, dtype=jnp.uint32)[None, :]
    seed = jnp.asarray(seed).astype(jnp.uint32)
    base = seed * jnp.uint32(0xC2B2AE35) + cell * jnp.uint32(0x27D4EB2F)
    x = (
        (i * jnp.uint32(0x9E3779B9) ^ j * jnp.uint32(0x85EBCA6B))[None, None]
        ^ base[:, :, None, None]
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    threshold = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return (x >= threshold).astype(jnp.float32) / (1.0 - rate)


def _xla_attention(q, k, v, lengths, seed, scale, rate):
    """Plain-XLA equivalent of the kernel's math (masked softmax, zeroed
    padded query rows, index-hash weight dropout) — the off-TPU per-shard
    body. Differentiable by plain autodiff."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    t = q.shape[2]
    kpos = jnp.arange(t)[None, None, None, :]
    s = s + jnp.where(kpos < lengths[:, None, None, None], 0.0, NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    qpos = jnp.arange(t)[None, None, :, None]
    w = w * (qpos < lengths[:, None, None, None]).astype(w.dtype)
    if rate > 0.0:
        w = w * _xla_keep_mask(seed, q.shape[0], q.shape[1], t, rate)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)


def fused_attention_sharded(
    mesh, q, k, v, lengths, seed, scale: float, dropout_rate: float
):
    """``fused_attention`` sharded over mesh axes (data→batch, model→heads)
    via ``jax.shard_map``.

    The kernel grid is per-(batch, head) independent, so sharding needs no
    communication — but GSPMD can't see that through an opaque
    ``pallas_call`` and would otherwise all-gather the operands. The
    dropout seed is decorrelated per shard by folding in the axis indices
    (each (b, h) grid cell already derives its own stream from the seed).
    Falls back to the unsharded call when the shapes don't divide the mesh.

    Off-TPU each shard computes the numerically-identical XLA formula
    instead (the TPU-interpret Pallas emulation does not compose with
    shard_map's per-device threads); weight dropout is TPU-only there.
    """
    from jax.sharding import PartitionSpec as P

    dp = mesh.shape.get("data", 1)
    tp = mesh.shape.get("model", 1)
    bsz, heads = q.shape[0], q.shape[1]
    if (dp == 1 and tp == 1) or bsz % dp or heads % tp:
        return fused_attention(q, k, v, lengths, seed, scale, dropout_rate)
    on_tpu = jax.default_backend() == "tpu"

    def body(qs, ks, vs, ls, sd):
        if dropout_rate > 0.0:
            di = jax.lax.axis_index("data")
            mi = jax.lax.axis_index("model")
            sd = sd + di * tp + mi
        if not on_tpu:
            return _xla_attention(qs, ks, vs, ls, sd, scale, dropout_rate)
        return fused_attention(qs, ks, vs, ls, sd, scale, dropout_rate)

    spec = P("data", "model", None, None)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, P("data"), P()),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, lengths, jnp.asarray(seed, jnp.int32))
