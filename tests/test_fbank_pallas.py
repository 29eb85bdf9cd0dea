"""Fused fbank Pallas kernel vs the XLA reference implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from asr_chinese_e2e_tpu.data.features import FeatureConfig, log_mel_spectrogram
from asr_chinese_e2e_tpu.ops.fbank_pallas import log_mel_spectrogram_pallas


@pytest.mark.parametrize("n_samples", [16000, 12345, 4000])
def test_pallas_fbank_matches_xla(n_samples):
    cfg = FeatureConfig(n_mels=80)
    rng = np.random.RandomState(0)
    wave = jnp.asarray(rng.randn(2, n_samples).astype(np.float32))
    want = np.asarray(log_mel_spectrogram(wave, cfg))
    got = np.asarray(log_mel_spectrogram_pallas(wave, cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_pallas_fbank_batch_consistency():
    cfg = FeatureConfig(n_mels=40)
    rng = np.random.RandomState(1)
    wave = jnp.asarray(rng.randn(3, 8000).astype(np.float32))
    full = np.asarray(log_mel_spectrogram_pallas(wave, cfg))
    single = np.asarray(log_mel_spectrogram_pallas(wave[1:2], cfg))
    np.testing.assert_allclose(full[1], single[0], rtol=1e-5)
