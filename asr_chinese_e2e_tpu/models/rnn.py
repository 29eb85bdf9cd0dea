"""RNN model family: BiLSTM encoder + location-aware-attention LSTM decoder.

Net-new capability relative to the reference (which is attention-only —
SURVEY §0: zero grep hits for lstm/gru/rnn); required by the BASELINE.json
north-star configs:
  #1  tiny 2-layer BiLSTM encoder + CTC-only loss (CPU-runnable slice);
  #2  BiLSTM encoder-decoder with location-aware attention + joint CTC/CE.

TPU design: recurrence runs under ``lax.scan`` (via flax ``nn.RNN``) so the
whole unrolled sequence compiles to one fused loop; the per-step matmuls are
batched (B, 4H) MXU ops. Variable length is handled with ``seq_lengths``
(flax masks carries and reverses correctly for the backward direction).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import Config
from ..ops.masks import NEG_INF, length_mask
from .transformer import preprocess_targets


def default_ctc_config() -> Config:
    """North-star config #1: tiny BiLSTM + CTC."""
    return Config(
        hidden_size=128,
        num_encoder_layers=2,
        dropout_rate=0.1,
        input_dim=320,
        ctc_weight=1.0,
        label_smoothing=0.0,
        max_target_len=128,
        dtype="float32",
    )


def default_las_config() -> Config:
    """North-star config #2: BiLSTM enc-dec, location-aware attention,
    joint CTC/CE."""
    cfg = default_ctc_config()
    cfg.build(
        num_encoder_layers=3,
        hidden_size=256,
        embed_dim=256,
        attention_dim=256,
        location_filters=10,
        location_kernel=31,
        num_decoder_layers=1,
        ctc_weight=0.3,
    )
    return cfg


class BiLSTMEncoder(nn.Module):
    """Stacked bidirectional LSTM over ``lax.scan``."""

    cfg: Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, feat_lengths, deterministic=True):
        x = feats.astype(self.dtype)
        h = self.cfg.hidden_size
        for i in range(self.cfg.num_encoder_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(h), name=f"fwd{i}")
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(h), reverse=True, keep_order=True, name=f"bwd{i}"
            )
            bi = nn.Bidirectional(fwd, bwd, name=f"bi{i}")
            x = bi(x, seq_lengths=feat_lengths)
            x = nn.Dropout(self.cfg.dropout_rate)(x, deterministic=deterministic)
        mask = length_mask(feat_lengths, x.shape[1]).astype(x.dtype)
        return x * mask[..., None], feat_lengths


class LocationAwareAttention(nn.Module):
    """Additive attention with convolutional location features.

    score(s, h_j) = w·tanh(W s + V h_j + U f_j + b), f = conv1d(prev_align)
    (Chorowski et al. 2015). Keeps a (B, T) alignment vector as decode
    state; masked positions get NEG_INF before the softmax.
    """

    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        a = self.cfg.attention_dim
        self.query_proj = nn.Dense(a, use_bias=True, dtype=self.dtype)
        self.location_conv = nn.Conv(
            self.cfg.location_filters,
            (self.cfg.location_kernel,),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )
        self.location_proj = nn.Dense(a, use_bias=False, dtype=self.dtype)
        self.score_proj = nn.Dense(1, use_bias=False, dtype=self.dtype)
        self.enc_proj_dense = nn.Dense(a, use_bias=False, dtype=self.dtype)

    def __call__(self, query, enc_proj, enc_out, prev_align, enc_mask_bias):
        """query: (B, D_dec); enc_proj: (B, T, A) = V·enc_out precomputed;
        prev_align: (B, T); enc_mask_bias: (B, T) additive.
        Returns (context (B, D_enc), align (B, T))."""
        q = self.query_proj(query)
        f = self.location_conv(prev_align[..., None].astype(self.dtype))
        f = self.location_proj(f)
        e = self.score_proj(jnp.tanh(q[:, None, :] + enc_proj + f))[..., 0]
        e = e.astype(jnp.float32) + enc_mask_bias
        align = jax.nn.softmax(e, axis=-1)
        context = jnp.einsum("bt,btd->bd", align.astype(self.dtype), enc_out)
        return context, align

    def project_encoder(self, enc_out):
        return self.enc_proj_dense(enc_out)


class LASDecoder(nn.Module):
    """Unidirectional LSTM decoder with location-aware attention.

    Teacher-forced path scans over target positions; ``step`` provides the
    cached single-token path for greedy/beam decoding."""

    cfg: Config
    vocab_size: int
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed = nn.Embed(self.vocab_size, c.embed_dim, dtype=self.dtype)
        self.cell = nn.OptimizedLSTMCell(c.hidden_size)
        self.attention = LocationAwareAttention(c, self.dtype)
        self.out_proj = nn.Dense(self.vocab_size, dtype=self.dtype)
        self.dropout = nn.Dropout(c.dropout_rate)

    def _init_carry(self, batch, enc_out, rng=None):
        carry = self.cell.initialize_carry(
            jax.random.PRNGKey(0), (batch, self.cfg.embed_dim + enc_out.shape[-1])
        )
        align = jnp.zeros((batch, enc_out.shape[1]), jnp.float32)
        context = jnp.zeros((batch, enc_out.shape[-1]), self.dtype)
        return carry, align, context

    def _one_step(self, token_emb, carry, align, context, enc_proj, enc_out, bias):
        inp = jnp.concatenate([token_emb, context], axis=-1)
        carry, s = self.cell(carry, inp)
        context, align = self.attention(s, enc_proj, enc_out, align, bias)
        logits = self.out_proj(jnp.concatenate([s, context], axis=-1))
        return carry, align, context, logits.astype(jnp.float32)

    def __call__(self, ys_in, enc_out, enc_lengths, deterministic=True):
        """Teacher-forced forward over target positions.

        The recurrence runs under a lifted ``nn.scan`` (params broadcast
        across steps) so the compiled program is ONE fused loop body — a
        Python unroll at max_target_len=128 produces a 128-step unrolled
        HLO graph with minutes-long compiles (see
        ``tests/test_rnn_models.py::test_las_scan_matches_unroll``)."""
        b, l = ys_in.shape
        enc_proj = self.attention.project_encoder(enc_out)
        bias = jnp.where(
            length_mask(enc_lengths, enc_out.shape[1]), 0.0, NEG_INF
        ).astype(jnp.float32)
        emb = self.dropout(self.embed(ys_in), deterministic=deterministic)
        carry0 = self._init_carry(b, enc_out)

        if self.cfg.get("decoder_unroll", False):  # oracle/debug path
            carry, align, context = carry0
            all_logits = []
            for t in range(l):
                carry, align, context, logits = self._one_step(
                    emb[:, t], carry, align, context, enc_proj, enc_out, bias
                )
                all_logits.append(logits)
            return jnp.stack(all_logits, axis=1)

        def body(mdl, c, x_t):
            carry, align, context = c
            carry, align, context, logits = mdl._one_step(
                x_t, carry, align, context, enc_proj, enc_out, bias
            )
            return (carry, align, context), logits

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": False},
            in_axes=1,
            out_axes=1,
        )
        _, logits = scan(self, carry0, emb)
        return logits

    # -- cached decode ------------------------------------------------------
    def init_state(self, enc_out, enc_lengths):
        """{"carry": per-hypothesis recurrent state (gathered on beam
        reorder), "static": beam-invariant encoder tensors (never
        gathered)}."""
        b = enc_out.shape[0]
        enc_proj = self.attention.project_encoder(enc_out)
        bias = jnp.where(
            length_mask(enc_lengths, enc_out.shape[1]), 0.0, NEG_INF
        ).astype(jnp.float32)
        carry, align, context = self._init_carry(b, enc_out)
        return {
            "carry": {"cell": carry, "align": align, "context": context},
            "static": {"enc_proj": enc_proj, "enc_out": enc_out, "bias": bias},
        }

    def step(self, tokens, state, index=None):
        del index  # RNN state carries position implicitly
        emb = self.embed(tokens)
        carry, align, context, logits = self._one_step(
            emb,
            state["carry"]["cell"],
            state["carry"]["align"],
            state["carry"]["context"],
            state["static"]["enc_proj"],
            state["static"]["enc_out"],
            state["static"]["bias"],
        )
        new_state = {
            "carry": {"cell": carry, "align": align, "context": context},
            "static": state["static"],
        }
        return jax.nn.log_softmax(logits, axis=-1), new_state


class BiLSTMCTC(nn.Module):
    """North-star config #1: BiLSTM encoder + CTC head only."""

    cfg: Config
    vocab_size: int

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def setup(self):
        self.encoder = BiLSTMEncoder(self.cfg, self.dtype)
        self.ctc_head = nn.Dense(self.vocab_size, dtype=self.dtype)

    def __call__(self, feats, feat_lengths, labels, label_lengths, deterministic=True):
        enc_out, enc_lengths = self.encoder(feats, feat_lengths, deterministic)
        return {
            # model dtype: the CTC loss upcasts internally (exact f32
            # selection/logsumexp)
            "ctc_logits": self.ctc_head(enc_out),
            "enc_out": enc_out,
            "enc_lengths": enc_lengths,
        }

    def encode(self, feats, feat_lengths):
        return self.encoder(feats, feat_lengths, deterministic=True)

    def ctc_log_probs(self, enc_out):
        return jax.nn.log_softmax(self.ctc_head(enc_out).astype(jnp.float32), -1)


class LAS(nn.Module):
    """North-star config #2: BiLSTM enc + location-aware-attention dec,
    joint CTC/CE."""

    cfg: Config
    vocab_size: int

    @property
    def dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

    def setup(self):
        self.encoder = BiLSTMEncoder(self.cfg, self.dtype)
        self.decoder = LASDecoder(self.cfg, self.vocab_size, self.dtype)
        if self.cfg.ctc_weight > 0.0:
            self.ctc_head = nn.Dense(self.vocab_size, dtype=self.dtype)

    def __call__(self, feats, feat_lengths, labels, label_lengths, deterministic=True):
        enc_out, enc_lengths = self.encoder(feats, feat_lengths, deterministic)
        ys_in, ys_out = preprocess_targets(labels, label_lengths)
        logits = self.decoder(ys_in, enc_out, enc_lengths, deterministic)
        out = {
            "logits": logits,
            "gold": ys_out,
            "enc_out": enc_out,
            "enc_lengths": enc_lengths,
        }
        if self.cfg.ctc_weight > 0.0:
            out["ctc_logits"] = self.ctc_head(enc_out)
        return out

    def encode(self, feats, feat_lengths):
        return self.encoder(feats, feat_lengths, deterministic=True)

    def init_decode_state(self, enc_out, enc_lengths, max_len: int = 0):
        del max_len
        return self.decoder.init_state(enc_out, enc_lengths)

    def decode_step(self, tokens, state, index=None):
        return self.decoder.step(tokens, state, index)

    def ctc_log_probs(self, enc_out):
        return jax.nn.log_softmax(self.ctc_head(enc_out).astype(jnp.float32), -1)
