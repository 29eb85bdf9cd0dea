"""Beam-search decode throughput on the flagship decoder (real TPU).

Measures audio-seconds/s/chip for batched attention beam search (B=64,
beam 10, max_len 40 — AISHELL-scale) in both cache-reorder modes:
``lazy`` (ancestry-map routing inside attention, no KV gather) and
``gather`` (physical carry gather per step). Run:

    timeout 1200 python scripts/bench_decode.py [--batch=64 --beam=10 ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(
    seconds: float = 8.0,
    batch: int = 64,
    vocab_size: int = 4233,
    beam: int = 10,
    max_len: int = 40,
    dtype: str = "bfloat16",
    n_iters: int = 5,
    modes: str = "lazy,gather",
):
    import jax

    from asr_chinese_e2e_tpu.data.features import FeatureConfig, parse_batch
    from asr_chinese_e2e_tpu.decode.beam import beam_search
    from asr_chinese_e2e_tpu.models.transformer import (
        SpeechTransformer,
        default_config,
    )

    feat_cfg = FeatureConfig()
    cfg = default_config().build(
        ctc_weight=0.3, dtype=dtype, input_dim=feat_cfg.feature_dim,
        dropout_rate=0.0,
    )
    model = SpeechTransformer(cfg, vocab_size)

    rng = np.random.RandomState(0)
    samples = int(seconds * feat_cfg.sample_rate)
    wave = jax.numpy.asarray(rng.randn(batch, samples).astype(np.float32) * 0.1)
    wave_len = jax.numpy.full((batch,), samples, np.int32)
    labels = jax.numpy.asarray(
        rng.randint(4, vocab_size, size=(batch, 20)).astype(np.int32)
    )
    label_lens = jax.numpy.full((batch,), 20, np.int32)

    feats, feat_lens = parse_batch(wave, wave_len, feat_cfg)
    params = model.init(
        jax.random.PRNGKey(0), feats, feat_lens, labels, label_lens
    )
    enc_out, enc_lens = model.apply(params, feats, feat_lens, method="encode")
    jax.block_until_ready(enc_out)
    print(f"enc_out {enc_out.shape} {enc_out.dtype}", file=sys.stderr)

    from asr_chinese_e2e_tpu.decode.joint import joint_beam_search

    for mode in modes.split(","):
        if mode == "joint":
            search = lambda: joint_beam_search(
                model, params, enc_out, enc_lens, beam, max_len,
                ctc_weight=0.3,
            )
        else:
            lazy = mode == "lazy"
            search = lambda: beam_search(
                model, params, enc_out, enc_lens, beam, max_len, lazy=lazy
            )
        t0 = time.perf_counter()
        r = search()
        print(
            f"[{mode}] compile+first: {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        t0 = time.perf_counter()
        for _ in range(n_iters):
            r = search()
        wall = (time.perf_counter() - t0) / n_iters
        tput = batch * seconds / wall
        print(
            f"[{mode}] {wall * 1e3:.1f} ms/batch = {tput:.0f} audio-s/s/chip "
            f"(best score {r.scores[0, 0]:.2f})"
        )


if __name__ == "__main__":
    from asr_chinese_e2e_tpu.utils.cli import parse_kwargs

    _, kwargs = parse_kwargs(sys.argv[1:])
    main(**kwargs)
