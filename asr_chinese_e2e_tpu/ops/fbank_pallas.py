"""Pallas TPU kernel: fused framing + windowed-DFT + mel + log.

The SURVEY §2.2 promise — "[Pallas] framing+STFT+mel+log as fused TPU
kernel". The XLA path (``data/features.py``) materialises the overlapping
frame tensor (B, T, 400) in HBM (~82 MB for a 64×8 s batch) before the DFT
matmuls; this kernel never does:

- the waveform stays in HBM; each grid step manually DMAs the (overlapping)
  sample window for a block of 128 frames into VMEM scratch;
- framing exploits hop=160 | win=400: with the window split into
  160-sample chunks, the windowed DFT decomposes into one matmul per
  chunk offset — frames@W = Σ_c chunks[c:c+F] @ W[c·hop:(c+1)·hop]
  (basis zero-padded past the window) — no gather, no concat (Mosaic
  rejects concats of offset-row slices);
- power, mel projection, log — all fused in VMEM; only the (B, T,
  n_mels) log-mel block is written back.

Constraint: ``hop_length`` must divide ``win_length`` (400/160 → the chunk
trick generalises to win = 2*hop + r). Falls back to interpret mode
off-TPU. CMVN/LFR stay in XLA (cheap global reductions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data.features import LOG_EPS, FeatureConfig, dft_basis, mel_filterbank

FRAME_BLOCK = 128  # frames per grid step
LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(wave_hbm, cos_ref, sin_ref, fb_ref, out_ref, scratch, sem, *,
            chunk_lane: int, n_chunks: int, n_offsets: int):
    b = pl.program_id(0)
    j = pl.program_id(1)

    # wave is pre-chunked to (B, S/hop, hop); DMA the 2D chunk window
    # (Mosaic cannot shape-cast 1D->2D in-kernel)
    dma = pltpu.make_async_copy(
        wave_hbm.at[b, pl.ds(j * FRAME_BLOCK, n_chunks), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    chunks = scratch[...]
    f_pad = cos_ref.shape[1]
    re = jnp.zeros((FRAME_BLOCK, f_pad), jnp.float32)
    im = jnp.zeros((FRAME_BLOCK, f_pad), jnp.float32)
    for c in range(n_offsets):
        blk = chunks[c : c + FRAME_BLOCK, :]  # (F, chunk_lane), row offset c
        re = re + jnp.dot(
            blk, cos_ref[c * chunk_lane : (c + 1) * chunk_lane, :],
            preferred_element_type=jnp.float32,
        )
        im = im + jnp.dot(
            blk, sin_ref[c * chunk_lane : (c + 1) * chunk_lane, :],
            preferred_element_type=jnp.float32,
        )
    power = re * re + im * im  # (FRAME_BLOCK, n_freq_pad)
    mel = jnp.dot(power, fb_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(mel + LOG_EPS)


@functools.partial(jax.jit, static_argnames=("cfg",))
def log_mel_spectrogram_pallas(wave: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """(B, S) float32 -> (B, T, n_mels); numerically matches
    ``data.features.log_mel_spectrogram``."""
    hop, win = cfg.hop_length, cfg.win_length
    assert win % hop == 0 or win > hop, (win, hop)
    bsz, s = wave.shape
    if cfg.center:
        pad = cfg.n_fft // 2
        wave = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
        s = s + 2 * pad
    n_frames = (s - win) // hop + 1
    t_blocks = _round_up(n_frames, FRAME_BLOCK) // FRAME_BLOCK

    n_chunks_extra = (win + hop - 1) // hop  # chunks spanned by one frame
    # DMA slice length on the chunk (sublane) dim must be 8-aligned
    block_chunks = _round_up(FRAME_BLOCK + n_chunks_extra - 1, 8)
    # pad samples so the last block's DMA stays in range, then pre-chunk
    # to (B, n_chunks_total, hop) for 2D in-kernel DMA windows
    needed = ((t_blocks - 1) * FRAME_BLOCK + block_chunks) * hop
    wave = jnp.pad(wave, ((0, 0), (0, max(0, needed - wave.shape[1]))))
    # chunk rows padded to a 128-aligned lane width (Mosaic slice rule);
    # the matching basis blocks are zero there so the matmuls are exact
    chunk_lane = _round_up(hop, LANES)
    wave = wave.reshape(bsz, wave.shape[1] // hop, hop)
    wave = jnp.pad(wave, ((0, 0), (0, 0), (0, chunk_lane - hop)))

    n_freqs = cfg.n_fft // 2 + 1
    f_pad = _round_up(n_freqs, LANES)
    m_pad = _round_up(cfg.n_mels, LANES)
    cos_b, sin_b = dft_basis(cfg)
    # basis laid out in per-offset blocks of chunk_lane rows: block c rows
    # [0, hop) hold W[c*hop : c*hop+hop] (clipped at win), rest zero
    rows = n_chunks_extra * chunk_lane
    cos_p = np.zeros((rows, f_pad), np.float32)
    sin_p = np.zeros((rows, f_pad), np.float32)
    for c in range(n_chunks_extra):
        lo, hi = c * hop, min((c + 1) * hop, win)
        cos_p[c * chunk_lane : c * chunk_lane + (hi - lo), :n_freqs] = cos_b[lo:hi]
        sin_p[c * chunk_lane : c * chunk_lane + (hi - lo), :n_freqs] = sin_b[lo:hi]
    fb = np.zeros((f_pad, m_pad), np.float32)
    fb[:n_freqs, : cfg.n_mels] = mel_filterbank(cfg)

    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda b, j: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, chunk_lane=chunk_lane, n_chunks=block_chunks,
            n_offsets=n_chunks_extra
        ),
        grid=(bsz, t_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # wave stays in HBM
            full(cos_p),
            full(sin_p),
            full(fb),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAME_BLOCK, m_pad),
            lambda b, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, t_blocks * FRAME_BLOCK, m_pad), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((block_chunks, chunk_lane), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() != "tpu",
    )(wave, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb))
    return out[:, :n_frames, : cfg.n_mels]
