"""CTC loss: log-space forward recursion as a ``lax.scan`` over time.

Net-new capability (the reference repo has no CTC — SURVEY §0; the
BASELINE.json north star requires the CTC/attention hybrid). Design notes:

- blank id = 0 (shared with PAD, which never occurs inside label sequences —
  see ``data/vocab.py`` docstring); matches the optax convention so
  ``optax.ctc_loss`` can serve as an oracle in tests;
- the alpha recursion is sequential in T but vectorised over (batch,
  extended-label) — each scan step is a handful of fused VPU ops on a
  (B, 2L+1) block; gradients come from autodiff through the scan
  (rematerialised alpha), with a Pallas forward-backward kernel as the
  planned fast path (SURVEY §7 risk register);
- all shapes static: variable T and label length are handled by masking the
  carry, so one compile per bucket shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG_NEG = -1e30  # safe -inf: exp underflows to 0, no NaN under autodiff


def extend_labels(labels: jnp.ndarray, blank_id: int = 0) -> jnp.ndarray:
    """(B, L) -> (B, 2L+1) blank-interleaved: [b, l1, b, l2, ..., b]."""
    b, l = labels.shape
    ext = jnp.full((b, 2 * l + 1), blank_id, dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-utterance negative log-likelihood.

    logits: (B, T, C) pre-softmax; logit_lengths: (B,) valid frames;
    labels: (B, L) target ids (no blanks), 0-padded; label_lengths: (B,).
    Returns (B,) loss values.
    """
    bsz, t_max, _ = logits.shape
    ext = extend_labels(labels, blank_id)  # (B, S)
    s = ext.shape[1]

    # transition structure (static per batch): allow skip s-2 -> s when the
    # symbol is not blank and differs from the symbol two back
    can_skip = jnp.concatenate(
        [jnp.zeros((bsz, 2), dtype=bool), (ext[:, 2:] != blank_id) & (ext[:, 2:] != ext[:, :-2])],
        axis=1,
    )  # (B, S)

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # per-step emission log-probs for each extended label: (T, B, S)
    emit = jnp.take_along_axis(
        log_probs, ext[:, None, :].astype(jnp.int32), axis=2
    ).transpose(1, 0, 2)

    alpha0 = jnp.full((bsz, s), BIG_NEG, dtype=jnp.float32)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(label_lengths > 0, emit[0, :, 1], BIG_NEG))

    def shift(x, k):
        pad = jnp.full((bsz, k), BIG_NEG, dtype=x.dtype)
        return jnp.concatenate([pad, x[:, :-k]], axis=1)

    def step(alpha, inp):
        emit_t, t = inp
        stay = jnp.logaddexp(alpha, shift(alpha, 1))
        with_skip = jnp.where(
            can_skip, jnp.logaddexp(stay, shift(alpha, 2)), stay
        )
        new = with_skip + emit_t
        # freeze the carry once past this utterance's length
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    ts = jnp.arange(1, t_max)
    alpha, _ = jax.lax.scan(step, alpha0, (emit[1:], ts))

    # total prob = alpha[2*label_len] + alpha[2*label_len - 1]
    last = (2 * label_lengths).astype(jnp.int32)  # final blank index
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    prev = jnp.maximum(last - 1, 0)
    a_prev = jnp.take_along_axis(alpha, prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, BIG_NEG)
    return -jnp.logaddexp(a_last, a_prev)
