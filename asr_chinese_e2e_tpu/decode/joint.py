"""One-pass joint CTC/attention beam search — all state on device.

The hybrid architecture's strongest decode mode (Watanabe et al. 2017,
"Hybrid CTC/Attention Architecture for End-to-End Speech Recognition"):
at every beam step the candidate score interpolates the attention
decoder's cumulative log-prob with the CTC *prefix probability*
``p(h, ...|X)`` — the mass of all complete CTC alignments whose decoded
sequence begins with hypothesis ``h``. This prunes attention hypotheses
that CTC considers unalignable (and vice versa) DURING the search, which
beats the two-stage CTC-prefix-beam + attention-rescoring pipeline
(``decode/ctc_prefix_device.py`` + ``recognize.py --mode rescore``).

The reference repo has no CTC at all (SURVEY §0); this is net-new
north-star capability, designed TPU-first:

- beam state is dense device arrays; one jitted program per
  (model, beam, max_len, ctc_weight) — ``lax.while_loop`` over steps;
- per step, CTC prefix scores are computed only for the top
  ``ctc_prune`` attention candidates (the standard pre-selection), via a
  ``lax.scan`` over frames carrying (r_nb, r_b) registers of shape
  (B, K, P) — fixed shapes, no Python;
- the per-hypothesis CTC forward registers r(t) live as (B, K, T)
  arrays gathered on reselection; the attention KV caches reorder with
  the same carry/static split as ``decode/beam.py``.

Scoring recursion (ESPnet-convention, log domain; xs = CTC log-probs):

    phi(t)      = r_b^g(t)  ⊕  [cand != last(g)] · r_nb^g(t)
    r_nb^h(t)   = (r_nb^h(t-1) ⊕ phi(t-1)) + xs(t, c)
    r_b^h(t)    = (r_b^h(t-1) ⊕ r_nb^h(t-1)) + xs(t, blank)
    psi (score) = ⊕_t  phi(t-1) + xs(t, c)          (prefix probability)
    eos         = r_nb^g(T-1) ⊕ r_b^g(T-1)           (complete-seq prob)

where ⊕ is logaddexp and h = g·c.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.vocab import BLANK_ID, BOS_ID, EOS_ID
from ..ops.masks import NEG_INF
from .beam import (
    _SPECIAL_SUPPRESS,
    BeamResult,
    _pin_cache_layouts,
    init_decode_state,
    make_gather_carry,
)
from .jit_cache import ModelJitCache

LOG_ZERO = -1e30


def _lae(a, b):
    return jnp.logaddexp(a, b)


# ---------------------------------------------------------------------------
# host reference (oracle for the device implementation; also usable for
# small-scale decoding without a TPU)
# ---------------------------------------------------------------------------


def ctc_prefix_scores_host(
    xs: np.ndarray, prefix: list, cands: list, blank_id: int = BLANK_ID
) -> tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Reference CTC prefix scorer for ONE utterance.

    xs: (T, C) log-probs; prefix: token ids of g; cands: candidate ids.
    Returns (psi (P,), r_nb (P, T), r_b (P, T), eos_score) for h = g·c.
    Precondition: caller supplies r-registers implicitly by recomputing g's
    registers from scratch (host oracle — clarity over speed)."""
    t_max = xs.shape[0]

    def registers(g):
        # r_nb/r_b of prefix g over frames (log domain)
        r_nb = np.full(t_max, LOG_ZERO)
        r_b = np.zeros(t_max)
        if not g:
            acc = 0.0
            for t in range(t_max):
                acc += xs[t, blank_id]
                r_b[t] = acc
            return r_nb, r_b
        # run the recursion symbol by symbol
        pg_nb, pg_b = registers(g[:-1])
        c = g[-1]
        last_prev = g[-2] if len(g) > 1 else None
        r_nb = np.full(t_max, LOG_ZERO)
        r_b = np.full(t_max, LOG_ZERO)
        for t in range(t_max):
            if t == 0:
                r_nb[0] = xs[0, c] if len(g) == 1 else LOG_ZERO
                r_b[0] = LOG_ZERO
                continue
            phi = pg_b[t - 1]
            if c != last_prev:
                phi = np.logaddexp(phi, pg_nb[t - 1])
            r_nb[t] = np.logaddexp(r_nb[t - 1], phi) + xs[t, c]
            r_b[t] = np.logaddexp(r_b[t - 1], r_nb[t - 1]) + xs[t, blank_id]
        return r_nb, r_b

    g_nb, g_b = registers(list(prefix))
    last = prefix[-1] if prefix else None
    p = len(cands)
    psi = np.full(p, LOG_ZERO)
    r_nb_out = np.full((p, t_max), LOG_ZERO)
    r_b_out = np.full((p, t_max), LOG_ZERO)
    for i, c in enumerate(cands):
        r_nb = np.full(t_max, LOG_ZERO)
        r_b = np.full(t_max, LOG_ZERO)
        if not prefix:
            r_nb[0] = xs[0, c]
            acc_psi = r_nb[0]
        else:
            acc_psi = LOG_ZERO
        for t in range(1, t_max):
            phi = g_b[t - 1]
            if last is None or c != last:
                phi = np.logaddexp(phi, g_nb[t - 1])
            r_nb[t] = np.logaddexp(r_nb[t - 1], phi) + xs[t, c]
            r_b[t] = np.logaddexp(r_b[t - 1], r_nb[t - 1]) + xs[t, blank_id]
            acc_psi = np.logaddexp(acc_psi, phi + xs[t, c])
        psi[i] = acc_psi
        r_nb_out[i] = r_nb
        r_b_out[i] = r_b
    eos_score = np.logaddexp(g_nb[t_max - 1], g_b[t_max - 1])
    return psi, r_nb_out, r_b_out, float(eos_score)


# ---------------------------------------------------------------------------
# device implementation
# ---------------------------------------------------------------------------


def _ctc_step_scores(ctc_lp_flat, frame_mask, r_nb_g, r_b_g, cand, last, is_empty):
    """Batched CTC prefix scores for candidate extensions.

    ctc_lp_flat: (B·C, T) CTC log-probs, class-major rows flattened so the
    candidate gather is a plain 2-D row gather (a (B, C, T) layout makes
    XLA re-copy the whole tensor inside the decode loop every step —
    profiled at 1.6 ms/step); frame_mask: (B, T) True for valid frames;
    r_nb_g / r_b_g: (B, K, T) parent registers; cand: (B, K, P) candidate
    ids; last: (B, K) last token of each parent (-1 if empty); is_empty:
    (B, K) parent-is-empty.

    Returns (psi (B,K,P), r_nb (B,K,P,T), r_b (B,K,P,T), eos (B,K))."""
    b, k, p = cand.shape
    t_max = ctc_lp_flat.shape[-1]
    c = ctc_lp_flat.shape[0] // b

    # xs[b,k,p,t] = ctc_lp[b, t, cand[b,k,p]] — flat row gather
    rows = jnp.arange(b, dtype=cand.dtype)[:, None, None] * c + cand
    xs = ctc_lp_flat[rows]  # (B, K, P, T)
    blank = ctc_lp_flat[jnp.arange(b) * c + BLANK_ID][:, None, :]  # (B, 1, T)
    # freeze the recursion on padded frames: emitting there is impossible
    # and blank is free, so registers/psi keep their last valid value
    fm = frame_mask[:, None, None, :]  # (B, 1, 1, T)
    xs = jnp.where(fm, xs, LOG_ZERO)
    blank = jnp.where(frame_mask[:, None, :], blank, 0.0)

    # phi[b,k,p,t] = r_b_g[t] (+ r_nb_g[t] unless cand == last)
    same = cand == last[:, :, None]  # (B, K, P)
    phi = jnp.where(
        same[:, :, :, None],
        r_b_g[:, :, None, :],
        _lae(r_b_g[:, :, None, :], r_nb_g[:, :, None, :]),
    )  # (B, K, P, T)

    empty = is_empty[:, :, None]  # (B, K, 1)
    r_nb0 = jnp.where(empty, xs[..., 0], LOG_ZERO)
    psi0 = r_nb0

    def step(carry, t):
        r_nb_prev, r_b_prev, psi_prev = carry
        grow = phi[..., t - 1] + xs[..., t]
        r_nb = _lae(r_nb_prev + xs[..., t], grow)
        r_b = _lae(r_b_prev, r_nb_prev) + blank[:, :, None, t]
        psi = _lae(psi_prev, grow)
        # padded frames leave registers and psi unchanged
        vm = frame_mask[:, None, None, t]
        r_nb = jnp.where(vm, r_nb, r_nb_prev)
        r_b = jnp.where(vm, r_b, r_b_prev)
        psi = jnp.where(vm, psi, psi_prev)
        return (r_nb, r_b, psi), (r_nb, r_b)

    (r_nb_T, r_b_T, psi), (r_nb_all, r_b_all) = jax.lax.scan(
        step,
        (r_nb0, jnp.full((b, k, p), LOG_ZERO), psi0),
        jnp.arange(1, t_max),
        # measured: unroll=16 is ~4% slower and 3.5x the compile time
    )
    # prepend t=0 row; scan stacked (T-1, B, K, P) -> (B, K, P, T)
    r_nb_all = jnp.concatenate(
        [r_nb0[None], r_nb_all], axis=0
    ).transpose(1, 2, 3, 0)
    r_b_all = jnp.concatenate(
        [jnp.full((1, b, k, p), LOG_ZERO), r_b_all], axis=0
    ).transpose(1, 2, 3, 0)

    # complete-sequence score of the PARENT (for the EOS candidate):
    # registers at the last VALID frame
    idx = jnp.sum(frame_mask, axis=1) - 1  # (B,)
    r_nb_last = jnp.take_along_axis(r_nb_g, idx[:, None, None], axis=2)[..., 0]
    r_b_last = jnp.take_along_axis(r_b_g, idx[:, None, None], axis=2)[..., 0]
    eos = _lae(r_nb_last, r_b_last)  # (B, K)
    return psi, r_nb_all, r_b_all, eos


def joint_beam_search(
    model,
    params,
    enc_out: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    beam_size: int,
    max_len: int,
    ctc_weight: float = 0.3,
    ctc_prune: int = 30,
    ctc_log_probs: Optional[jnp.ndarray] = None,
) -> BeamResult:
    """One-pass joint decode: score = (1−λ)·attention + λ·CTC-prefix.

    ``ctc_prune``: CTC prefix scores are evaluated for the top-``P``
    attention candidates per hypothesis (plus EOS, always scored via the
    parent's complete-sequence probability). ``ctc_log_probs`` may be
    precomputed (B, T, C); otherwise taken from ``model.ctc_log_probs``.
    ``ctc_weight=0`` reduces to pure attention beam search over the
    pruned candidate set."""
    cache = _JIT_CACHE.scope(model)
    if ctc_log_probs is None:
        lp_fn = cache.get("lp")
        if lp_fn is None:
            # eager (op-by-op) model.apply costs ~100 ms of host dispatch
            # for the (B, T, C) head + log_softmax — jit it once per model
            lp_fn = jax.jit(
                lambda prm, eo: model.apply(prm, eo, method="ctc_log_probs")
            )
            cache["lp"] = lp_fn
        ctc_log_probs = lp_fn(params, enc_out)
    ctc_prune = min(ctc_prune, int(ctc_log_probs.shape[-1]))
    key = (beam_size, max_len, ctc_weight, ctc_prune)
    fn = cache.get(key)
    if fn is None:
        fn = jax.jit(
            functools.partial(
                _joint_impl,
                model,
                beam_size=beam_size,
                max_len=max_len,
                ctc_weight=ctc_weight,
                ctc_prune=ctc_prune,
            )
        )
        cache[key] = fn
    tokens, scores, finished = fn(params, enc_out, enc_lengths, ctc_log_probs)
    return BeamResult(np.asarray(tokens), np.asarray(scores), np.asarray(finished))


_JIT_CACHE = ModelJitCache()


def _joint_impl(
    model,
    params,
    enc_out,
    enc_lengths,
    ctc_lp,
    *,
    beam_size: int,
    max_len: int,
    ctc_weight: float,
    ctc_prune: int,
):
    bsz, k = enc_out.shape[0], beam_size
    p = ctc_prune
    t_max = ctc_lp.shape[1]
    lam = float(ctc_weight)

    state = init_decode_state(model, params, enc_out, enc_lengths, max_len + 1, k)
    static = state["static"]
    carry_state0 = _pin_cache_layouts(state["carry"])
    gather_carry = make_gather_carry(bsz, k)

    v = ctc_lp.shape[-1]
    # (B·C, T) class-major rows: candidate log-probs become a 2-D row
    # gather with no in-loop layout copies
    ctc_lp_flat = ctc_lp.transpose(0, 2, 1).reshape(bsz * v, t_max)
    frame_mask = jnp.arange(t_max)[None, :] < enc_lengths[:, None]

    tokens0 = jnp.zeros((bsz, k, max_len + 1), jnp.int32).at[:, :, 0].set(BOS_ID)
    att0 = jnp.zeros((bsz, k), jnp.float32)
    # CTC registers of the (empty) initial prefix: r_b = cumsum blank
    blank_cum = jnp.cumsum(
        jnp.where(frame_mask, ctc_lp[:, :, BLANK_ID], 0.0), axis=1
    )  # (B, T)
    r_nb0 = jnp.full((bsz, k, t_max), LOG_ZERO)
    r_b0 = jnp.tile(blank_cum[:, None, :], (1, k, 1))
    ctc0 = jnp.zeros((bsz, k), jnp.float32)  # cumulative CTC prefix score
    finished0 = jnp.zeros((bsz, k), bool)

    def cond(c):
        i, finished = c[0], c[4]
        return (i < max_len) & ~jnp.all(finished)

    def body(c):
        (i, tokens, att, ctc, finished, carry_state, r_nb, r_b) = c
        last = tokens[:, :, i].reshape(bsz * k)
        logp, st = model.apply(
            params, last, {"carry": carry_state, "static": static}, i,
            method="decode_step",
        )
        carry_new = _pin_cache_layouts(st["carry"])
        logp = logp.reshape(bsz, k, v)
        # PAD/blank, UNK and BOS are never valid candidate extensions —
        # extending a CTC prefix with the blank id is meaningless, and a
        # weakly trained decoder can otherwise emit them into hypotheses
        logp = logp.at[:, :, :_SPECIAL_SUPPRESS].set(NEG_INF)

        # top-P attention candidates; EOS is forced into slot P-1 so the
        # hypothesis can always terminate. top_k runs on a 2-D view: the
        # 3-D form lowers to a full per-row SORT of the vocab on TPU
        # (profiled at 3.2 ms/step vs ~0.15 ms for 2-D)
        att_top, cand = jax.lax.top_k(logp.reshape(bsz * k, v), p)
        att_top = att_top.reshape(bsz, k, p)
        cand = cand.reshape(bsz, k, p)
        cand = cand.at[:, :, p - 1].set(EOS_ID)
        att_top = att_top.at[:, :, p - 1].set(logp[:, :, EOS_ID])
        # a natural EOS in an earlier slot would duplicate the forced one
        dup_eos = (cand == EOS_ID).at[:, :, p - 1].set(False)

        last_tok = jnp.where(i == 0, -1, tokens[:, :, i])  # (B, K)
        is_empty = i == 0
        empty_k = jnp.full((bsz, k), is_empty)
        psi, r_nb_c, r_b_c, eos_sc = _ctc_step_scores(
            ctc_lp_flat, frame_mask, r_nb, r_b, cand, last_tok, empty_k
        )
        is_eos = cand == EOS_ID
        ctc_cand = jnp.where(is_eos, eos_sc[:, :, None], psi)  # (B,K,P)

        att_cand = att[:, :, None] + att_top
        total = (1.0 - lam) * att_cand + lam * ctc_cand
        # finished hyps: only the forced-EOS slot stays live, score frozen
        frozen = (1.0 - lam) * att[:, :, None] + lam * ctc[:, :, None]
        total = jnp.where(
            finished[:, :, None],
            jnp.where(is_eos, frozen, NEG_INF),
            total,
        )
        # suppressions must be ADDITIVE sentinels on `total`, never scaled
        # by (1-lam) — at ctc_weight=1 a scaled mask vanishes and the beam
        # collapses to duplicates:
        # - duplicate-EOS slots
        # - at step 0 every parent slot but 0 (all hold the same BOS)
        dead0 = (i == 0) & (jnp.arange(k)[None, :, None] > 0)
        total = jnp.where(dup_eos | dead0, NEG_INF, total)

        top_scores, top_idx = jax.lax.top_k(total.reshape(bsz, k * p), k)
        parent = top_idx // p  # (B, K)
        slot = top_idx % p

        def sel2(x):  # (B, K, P) -> (B, K) at (parent, slot)
            xp = jnp.take_along_axis(x, parent[:, :, None], axis=1)
            return jnp.take_along_axis(xp, slot[:, :, None], axis=2)[..., 0]

        def sel3(x):  # (B, K, P, T) -> (B, K, T)
            xp = jnp.take_along_axis(x, parent[:, :, None, None], axis=1)
            return jnp.take_along_axis(
                xp, slot[:, :, None, None], axis=2
            )[:, :, 0, :]

        token = sel2(cand).astype(jnp.int32)
        was_finished = jnp.take_along_axis(finished, parent, axis=1)
        new_att = jnp.where(
            was_finished,
            jnp.take_along_axis(att, parent, axis=1),
            jnp.take_along_axis(att, parent, axis=1) + sel2(att_top),
        )
        new_ctc = jnp.where(
            was_finished,
            jnp.take_along_axis(ctc, parent, axis=1),
            sel2(ctc_cand),
        )
        # registers advance only for live non-EOS extensions
        live_ext = ~was_finished & (token != EOS_ID)
        par_r_nb = jnp.take_along_axis(r_nb, parent[:, :, None], axis=1)
        par_r_b = jnp.take_along_axis(r_b, parent[:, :, None], axis=1)
        r_nb = jnp.where(live_ext[:, :, None], sel3(r_nb_c), par_r_nb)
        r_b = jnp.where(live_ext[:, :, None], sel3(r_b_c), par_r_b)

        carry_state = gather_carry(carry_new, parent)
        tokens = jnp.take_along_axis(
            tokens, parent[:, :, None], axis=1
        ).at[:, :, i + 1].set(token)
        finished = was_finished | (token == EOS_ID)
        return (
            i + 1, tokens, new_att, new_ctc, finished, carry_state, r_nb, r_b,
        )

    carry = (
        jnp.asarray(0), tokens0, att0, ctc0, finished0,
        carry_state0, r_nb0, r_b0,
    )
    out = jax.lax.while_loop(cond, body, carry)
    _, tokens, att, ctc, finished = out[:5]
    scores = (1.0 - lam) * att + lam * ctc
    order = jnp.argsort(-scores, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    tokens = jnp.take_along_axis(tokens[:, :, 1:], order[:, :, None], axis=1)
    finished = jnp.take_along_axis(finished, order, axis=1)
    return tokens, scores, finished
