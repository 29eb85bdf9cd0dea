"""On-chip CTC prefix beam search — fixed-shape device arrays throughout.

The BASELINE.json north star asks for "decoding beam state liv[ing] in
fixed-shape device arrays with hypothesis pruning done on-chip". The exact
host implementation (``decode/ctc_prefix.py``) keeps a Python dict of
prefixes; this version keeps everything dense on device:

- state: prefixes (B, K, L) int32, lengths (B, K), last tokens (B, K),
  and the classic per-prefix (log p ending-in-blank, ending-in-non-blank)
  pair (B, K);
- one ``lax.scan`` step per frame: per-frame vocab pruning via
  ``lax.top_k`` (P candidates), a (B, K·(P+1)) candidate score matrix
  (the +1 is the "stay" candidate: blank or repeat-of-last), global
  ``top_k`` K pruning, batched gathers to reorder state;
- variable length via a carry freeze mask.

Duplicate prefixes (the same string reachable from different parent
beams) are MERGED on device at every step: a K×K prefix-equality matrix
folds the (pb, pnb) mass of duplicates into their first occurrence via a
masked logsumexp and kills the copies — matching the exact host search's
dict semantics (verified 1-best-identical against it in tests).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.vocab import BLANK_ID
from ..ops.ctc import BIG_NEG


def _merge_duplicates(prefixes, plen, last, pb, pnb):
    """Fold the probability mass of duplicate prefixes into their first
    occurrence (masked logsumexp over a K×K equality matrix); duplicates
    are killed to BIG_NEG so top-k reuses their slots."""
    bsz, k, l = prefixes.shape
    same_len = plen[:, :, None] == plen[:, None, :]
    pos = jnp.arange(l)[None, None, None, :]
    valid = pos < plen[:, :, None, None]  # (B, K, 1, L)
    tok_eq = prefixes[:, :, None, :] == prefixes[:, None, :, :]
    eq = same_len & jnp.all(tok_eq | ~valid, axis=-1)  # (B, K, K)
    live = jnp.logaddexp(pb, pnb) > BIG_NEG / 2
    eq = eq & live[:, :, None] & live[:, None, :]
    eq = eq | (jnp.eye(k, dtype=bool)[None])  # self always
    rep = jnp.argmax(eq, axis=1)  # (B, K): first equal index per column j
    fold = rep[:, None, :] == jnp.arange(k)[None, :, None]  # (B, K_i, K_j)

    def fold_mass(x):
        contrib = jnp.where(fold, x[:, None, :], BIG_NEG)  # (B, Ki, Kj)
        m = jnp.max(contrib, axis=2, keepdims=True)
        s = m[..., 0] + jnp.log(
            jnp.sum(jnp.exp(contrib - m), axis=2)
        )
        return jnp.where(jnp.isfinite(s), s, BIG_NEG)

    pb2, pnb2 = fold_mass(pb), fold_mass(pnb)
    is_rep = rep == jnp.arange(k)[None, :]
    pb2 = jnp.where(is_rep, pb2, BIG_NEG)
    pnb2 = jnp.where(is_rep, pnb2, BIG_NEG)
    return prefixes, plen, last, pb2, pnb2


@functools.partial(
    jax.jit, static_argnames=("beam_size", "prune", "max_prefix_len")
)
def ctc_prefix_beam_device(
    log_probs: jnp.ndarray,  # (B, T, C)
    logit_lengths: jnp.ndarray,  # (B,)
    beam_size: int = 10,
    prune: int = 8,
    max_prefix_len: int = 64,
):
    """Returns (prefixes (B, K, L) int32, prefix_lengths (B, K),
    scores (B, K)) sorted best-first."""
    bsz, t_max, vocab = log_probs.shape
    k, p, l = beam_size, min(prune, vocab), max_prefix_len

    prefixes0 = jnp.zeros((bsz, k, l), jnp.int32)
    plen0 = jnp.zeros((bsz, k), jnp.int32)
    last0 = jnp.full((bsz, k), -1, jnp.int32)  # -1 = empty prefix
    # only beam 0 live initially: (pb, pnb) = (log 1, log 0)
    pb0 = jnp.full((bsz, k), BIG_NEG, jnp.float32).at[:, 0].set(0.0)
    pnb0 = jnp.full((bsz, k), BIG_NEG, jnp.float32)

    def step(carry, inp):
        prefixes, plen, last, pb, pnb = _merge_duplicates(*carry)
        frame, t = inp  # (B, C), scalar
        p_blank = frame[:, BLANK_ID][:, None]  # (B, 1)
        top_vals, top_idx = jax.lax.top_k(frame, p)  # (B, P)
        # mask the blank out of the extend candidates (handled by "stay")
        is_blank = top_idx == BLANK_ID
        top_vals = jnp.where(is_blank, BIG_NEG, top_vals)

        # p(last token of each beam) under this frame
        last_safe = jnp.where(last < 0, 0, last)
        p_last = jnp.take_along_axis(frame[:, None, :].repeat(k, 1), last_safe[..., None], axis=2)[..., 0]
        p_last = jnp.where(last < 0, BIG_NEG, p_last)  # empty prefix: no repeat

        # ---- stay candidate (prefix unchanged) ----
        stay_pb = jnp.logaddexp(pb, pnb) + p_blank  # blank path
        stay_pnb = pnb + p_last  # repeat of last without blank
        stay_score = jnp.logaddexp(stay_pb, stay_pnb)  # (B, K)

        # ---- extend candidates (append token c) ----
        cand_tok = top_idx[:, None, :].repeat(k, 1)  # (B, K, P)
        cand_lp = top_vals[:, None, :]  # (B, 1, P) broadcast
        same_as_last = cand_tok == last[..., None]
        # same token: only the post-blank path extends; different: both
        ext_pnb = jnp.where(
            same_as_last,
            pb[..., None] + cand_lp,
            jnp.logaddexp(pb, pnb)[..., None] + cand_lp,
        )
        # can't grow past L: kill extends for full prefixes
        ext_pnb = jnp.where((plen >= l)[..., None], BIG_NEG, ext_pnb)

        # ---- exact merge-before-select (host dict semantics) ----
        # an extend of beam j that recreates beam i's prefix (prefix_i ==
        # prefix_j + [last_i]) must fold into beam i's STAY candidate and
        # vanish from the extend set, or its mass splits and the frontier
        # shrinks.
        live = jnp.logaddexp(pb, pnb) > BIG_NEG / 2  # (B, K)
        plen_match = plen[:, :, None] == (plen[:, None, :] + 1)  # (B, i, j)
        pos = jnp.arange(l)[None, None, None, :]
        within_j = pos < plen[:, None, :, None]  # (B, 1, j, L)
        tok_eq = prefixes[:, :, None, :] == prefixes[:, None, :, :]
        prefix_match = jnp.all(tok_eq | ~within_j, axis=-1)
        is_parent = (
            plen_match
            & prefix_match
            & (plen[:, :, None] > 0)
            & live[:, :, None]
            & live[:, None, :]
        )  # (B, i, j)
        base_j = jnp.where(
            last[:, None, :] == last[:, :, None],  # last_j == c (= last_i)
            pb[:, None, :],
            jnp.logaddexp(pb, pnb)[:, None, :],
        )  # (B, i, j)
        contrib = jnp.where(
            is_parent, base_j + p_last[:, :, None], BIG_NEG
        )
        cmax = jnp.max(contrib, axis=2, keepdims=True)
        csum = cmax[..., 0] + jnp.log(jnp.sum(jnp.exp(contrib - cmax), axis=2))
        csum = jnp.where(jnp.isfinite(csum), csum, BIG_NEG)
        stay_pnb = jnp.logaddexp(stay_pnb, csum)
        stay_score = jnp.logaddexp(stay_pb, stay_pnb)
        # kill the folded extend candidates
        ext_kill = jnp.any(
            is_parent[:, :, :, None]
            & (cand_tok[:, None, :, :] == last[:, :, None, None]),
            axis=1,
        )  # (B, j, P)
        ext_pnb = jnp.where(ext_kill, BIG_NEG, ext_pnb)
        ext_score = ext_pnb  # pb' = -inf for a freshly extended prefix

        # ---- global top-k over K*(P+1) candidates ----
        all_scores = jnp.concatenate(
            [stay_score[..., None], ext_score], axis=2
        ).reshape(bsz, k * (p + 1))
        sel_score, sel_idx = jax.lax.top_k(all_scores, k)  # (B, K)
        parent = sel_idx // (p + 1)
        slot = sel_idx % (p + 1)  # 0 = stay, 1..P = extend with top_idx[slot-1]

        take = lambda arr: jnp.take_along_axis(arr, parent, axis=1)
        new_prefixes = jnp.take_along_axis(
            prefixes, parent[..., None], axis=1
        )
        new_plen = take(plen)
        new_last = take(last)
        is_ext = slot > 0
        tok = jnp.take_along_axis(
            cand_tok[:, 0, :], jnp.maximum(slot - 1, 0), axis=1
        )  # (B, K) token for extend slots (cand_tok same across k)
        # append token for extend candidates
        write_pos = jnp.minimum(new_plen, l - 1)
        new_prefixes = jnp.where(
            (jnp.arange(l)[None, None, :] == write_pos[..., None]) & is_ext[..., None],
            tok[..., None],
            new_prefixes,
        )
        new_plen = jnp.where(is_ext, new_plen + 1, new_plen)
        new_last = jnp.where(is_ext, tok, new_last)
        new_pb = jnp.where(is_ext, BIG_NEG, take(stay_pb))
        new_pnb = jnp.where(
            is_ext,
            jnp.take_along_axis(
                jnp.concatenate([stay_pnb[..., None], ext_pnb], axis=2).reshape(
                    bsz, k * (p + 1)
                ),
                sel_idx,
                axis=1,
            ),
            take(stay_pnb),
        )

        # freeze carries past each utterance's length
        active = (t < logit_lengths)[:, None]
        out = (
            jnp.where(active[..., None], new_prefixes, prefixes),
            jnp.where(active, new_plen, plen),
            jnp.where(active, new_last, last),
            jnp.where(active, new_pb, pb),
            jnp.where(active, new_pnb, pnb),
        )
        return out, None

    carry0 = (prefixes0, plen0, last0, pb0, pnb0)
    (prefixes, plen, last, pb, pnb), _ = jax.lax.scan(
        step,
        carry0,
        (log_probs.transpose(1, 0, 2), jnp.arange(t_max)),
    )
    prefixes, plen, last, pb, pnb = _merge_duplicates(
        prefixes, plen, last, pb, pnb
    )
    scores = jnp.logaddexp(pb, pnb)
    order = jnp.argsort(-scores, axis=1)
    return (
        jnp.take_along_axis(prefixes, order[..., None], axis=1),
        jnp.take_along_axis(plen, order, axis=1),
        jnp.take_along_axis(scores, order, axis=1),
    )


def device_nbest_to_lists(
    prefixes, plen, scores
) -> List[List[Tuple[Tuple[int, ...], float]]]:
    """Convert device beam output to the host n-best format used by
    ``attention_rescore``."""
    prefixes, plen, scores = (np.asarray(x) for x in (prefixes, plen, scores))
    out = []
    for b in range(prefixes.shape[0]):
        hyps = []
        seen = set()
        for kk in range(prefixes.shape[1]):
            ids = tuple(int(x) for x in prefixes[b, kk, : plen[b, kk]])
            if ids in seen:  # unmerged duplicates: keep the best copy
                continue
            seen.add(ids)
            hyps.append((ids, float(scores[b, kk])))
        out.append(hyps)
    return out
