"""Pallas CTC kernel vs the scan implementation and optax (values + grads).

Runs in interpret mode on CPU (the kernel auto-selects interpret off-TPU);
the same code path compiles natively on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from asr_chinese_e2e_tpu.ops.ctc import ctc_loss
from asr_chinese_e2e_tpu.ops.ctc_pallas import ctc_loss_pallas


def make_case(seed, B=4, T=20, L=6, C=10, lens=None, label_lens=None):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    logit_lens = jnp.asarray(lens if lens is not None else [T] * B)
    ll = label_lens if label_lens is not None else [L] * B
    labels = rng.randint(1, C, size=(B, L))
    for b in range(B):
        labels[b, ll[b] :] = 0
    return logits, logit_lens, jnp.asarray(labels), jnp.asarray(ll)


@pytest.mark.parametrize(
    "lens,label_lens",
    [
        (None, None),
        ([20, 17, 12, 9], [6, 4, 3, 1]),
        ([20, 20, 20, 20], [6, 6, 1, 2]),
    ],
)
def test_pallas_ctc_matches_scan(lens, label_lens):
    logits, logit_lens, labels, ll = make_case(0, lens=lens, label_lens=label_lens)
    got = ctc_loss_pallas(logits, logit_lens, labels, ll)
    want = ctc_loss(logits, logit_lens, labels, ll)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)


def test_pallas_ctc_grad_matches_optax():
    logits, logit_lens, labels, ll = make_case(
        1, lens=[20, 15, 20, 11], label_lens=[5, 3, 6, 2]
    )
    B, T, L = 4, 20, 6
    logit_pad = (np.arange(T)[None] >= np.asarray(logit_lens)[:, None]).astype(
        np.float32
    )
    label_pad = (np.arange(L)[None] >= np.asarray(ll)[:, None]).astype(np.float32)

    def ours(x):
        return ctc_loss_pallas(x, logit_lens, labels, ll).sum()

    def theirs(x):
        return optax.ctc_loss(
            x, jnp.asarray(logit_pad), labels, jnp.asarray(label_pad)
        ).sum()

    v1, g1 = jax.value_and_grad(ours)(logits)
    v2, g2 = jax.value_and_grad(theirs)(logits)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)


def test_pallas_ctc_weighted_cotangent():
    logits, logit_lens, labels, ll = make_case(2)
    w = jnp.asarray([1.0, 0.5, 2.0, 0.0])

    def weighted(x):
        return (ctc_loss_pallas(x, logit_lens, labels, ll) * w).sum()

    def weighted_ref(x):
        return (ctc_loss(x, logit_lens, labels, ll) * w).sum()

    g1 = jax.grad(weighted)(logits)
    g2 = jax.grad(weighted_ref)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)


def test_pallas_ctc_odd_shapes():
    # non-multiple-of-8 batch, S far from 128
    logits, logit_lens, labels, ll = make_case(3, B=3, T=7, L=2, C=5)
    got = ctc_loss_pallas(logits, logit_lens, labels, ll)
    want = ctc_loss(logits, logit_lens, labels, ll)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)


def test_pallas_ctc_under_jit_and_vjp_composition():
    logits, logit_lens, labels, ll = make_case(4)

    @jax.jit
    def f(x):
        return ctc_loss_pallas(x * 2.0, logit_lens, labels, ll).mean()

    @jax.jit
    def f_ref(x):
        return ctc_loss(x * 2.0, logit_lens, labels, ll).mean()

    g1 = jax.grad(f)(logits)
    g2 = jax.grad(f_ref)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)


def test_bf16_logits_select_exactly():
    """The emission-selection einsum reads logits in their STORAGE dtype
    (one-hot in the same dtype, f32 accumulation): every product has an
    exactly-representable 0/1 factor, so the selected log-prob equals
    logsoftmax(logits.astype(f32)) gathered at the label — bit-for-bit,
    with no f32 (B, T, C) materialization. Pin that equivalence."""
    import jax.numpy as jnp

    from asr_chinese_e2e_tpu.ops.ctc_pallas import _ctc_fwd
    from asr_chinese_e2e_tpu.ops.ctc import extend_labels

    logits, logit_lens, labels, ll = make_case(9, B=2, T=6, L=2, C=7)
    logits = logits.astype(jnp.bfloat16)
    loss, res = _ctc_fwd(logits, logit_lens, labels, ll, 0)
    emit = res[4]  # (T, Bp, Sp) padded emission log-probs
    x32 = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(x32, axis=-1)  # (B, T)
    ext = extend_labels(labels, 0)  # (B, S)
    want = (
        jnp.take_along_axis(
            x32, ext[:, None, :].repeat(x32.shape[1], 1), axis=-1
        )
        - lse[:, :, None]
    )  # (B, T, S) — same association as the implementation
    got = emit[:, : want.shape[0], : want.shape[2]].transpose(1, 0, 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
