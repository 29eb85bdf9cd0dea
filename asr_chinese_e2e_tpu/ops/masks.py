"""Length/causal mask builders — ONE convention: additive -inf bias masks.

The reference mixes two polarity conventions (1=keep multiplied masks in
``Predictor/data_handler/masker.py:60-93`` vs 1=drop ``masked_fill`` masks in
``Predictor/Models/utils.py:100-144``) and builds them with Python loops over
the batch (``Models/utils.py:106-109``). Here every mask is derived from a
lengths vector with broadcasted compares (no loops) and consumed as an
additive bias on attention logits (0 = attend, NEG_INF = blocked), which XLA
fuses into the attention matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9  # finite, to avoid NaN from (-inf) - (-inf) in softmax shifts


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) -> (B, T) bool, True = valid position.

    Replaces ``get_non_pad_mask`` (``Models/utils.py:112-121``)."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def padding_bias(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) -> (B, 1, 1, T) additive bias blocking padded KEY positions.

    Replaces ``get_attn_key_pad_mask``/``get_attn_pad_mask``
    (``Models/utils.py:124-136``); broadcasts over heads and query length."""
    valid = length_mask(lengths, max_len)
    return jnp.where(valid, 0.0, NEG_INF)[:, None, None, :]


def causal_bias(max_len: int) -> jnp.ndarray:
    """(1, 1, T, T) additive bias blocking future positions.

    Replaces ``get_subsequent_mask`` (``Models/utils.py:139-144``)."""
    row = jnp.arange(max_len)[:, None]
    col = jnp.arange(max_len)[None, :]
    return jnp.where(col <= row, 0.0, NEG_INF)[None, None, :, :]


def causal_padding_bias(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Combined causal + key-padding bias for decoder self-attention."""
    return causal_bias(max_len) + padding_bias(lengths, max_len)


def banded_bias(max_len: int, band: int) -> jnp.ndarray:
    """(1, 1, T, T) additive bias allowing only |i-j| <= band.

    Generalises TransformerNew's ±50-frame banded encoder self-attention
    (``Predictor/Models/transformer_new.py:53``) as a local-attention option."""
    row = jnp.arange(max_len)[:, None]
    col = jnp.arange(max_len)[None, :]
    return jnp.where(jnp.abs(col - row) <= band, 0.0, NEG_INF)[None, None, :, :]


def causal_banded_bias(max_len: int, band: int) -> jnp.ndarray:
    """(1, 1, T, T) additive bias allowing only i-band <= j <= i.

    The streaming-encoder attention pattern: strictly left context, bounded
    at ``band`` frames — each output depends on a fixed-width past window,
    which is what makes exact chunked incremental encoding possible
    (``Encoder.encode_chunk`` carries ``band`` frames of per-layer state)."""
    row = jnp.arange(max_len)[:, None]
    col = jnp.arange(max_len)[None, :]
    keep = (col <= row) & (row - col <= band)
    return jnp.where(keep, 0.0, NEG_INF)[None, None, :, :]
