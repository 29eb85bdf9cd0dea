#!/usr/bin/env python
"""Training-throughput benchmark on the flagship model.

Measures audio-seconds/s/chip (the BASELINE.json north-star metric) for the
full jitted training step — on-device fbank/CMVN/LFR + SpeechTransformer
(reference hyperparams 512d/8h/6+6L, ``transformer_official.py:112-124``)
+ hybrid CTC/CE loss + Noam/Adam — on synthetic 8-second utterances at the
reference batch size 64 (``main.py:103``).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline`` is null: the reference publishes no benchmark numbers
(README "Under progress"; BASELINE.md — "published": {}).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(
    seconds: float = 8.0,
    batch: int = 64,
    vocab_size: int = 4233,  # AISHELL-1 char vocab scale
    label_len: int = 20,
    ctc_weight: float = 0.3,
    dtype: str = "bfloat16",
    n_steps: int = 10,
    attn_impl: str = "fused",  # fused Pallas kernel w/ in-kernel weight
    # dropout — verified equivalent to the XLA path (tests/test_fused_attention)
    # and +17% step throughput on v5e
    fbank_impl: str = "pallas",  # fused fbank kernel (xla kept as the
    # library default so CPU tests skip the interpreter)
    steps_per_dispatch: int = 1,  # k train steps per jitted dispatch
    # (train_step.make_multi_step) — amortizes remote-dispatch latency
    **model_overrides,
):
    import jax

    from asr_chinese_e2e_tpu.data.features import FeatureConfig
    from asr_chinese_e2e_tpu.models.transformer import (
        SpeechTransformer,
        default_config,
    )
    from asr_chinese_e2e_tpu.train.optimizer import (
        default_train_config,
        make_optimizer,
    )
    from asr_chinese_e2e_tpu.train.train_step import make_step_fns

    n_chips = len(jax.devices())
    log(f"devices: {jax.devices()}")

    feat_cfg = FeatureConfig(fbank_impl=fbank_impl)
    cfg = default_config().build(
        ctc_weight=ctc_weight, dtype=dtype, input_dim=feat_cfg.feature_dim,
        attn_impl=attn_impl, **model_overrides,
    )
    tcfg = default_train_config().combine(cfg).build(spec_augment=True)
    model = SpeechTransformer(cfg, vocab_size)
    tx = make_optimizer(tcfg, cfg.d_model)
    init_fn, train_step, _ = make_step_fns(model, tx, feat_cfg, tcfg)

    rng = np.random.RandomState(0)
    samples = int(seconds * feat_cfg.sample_rate)
    host_batch = {
        "wave": np.asarray(rng.randn(batch, samples) * 0.1, np.float32),
        "wave_lengths": np.full((batch,), samples, np.int32),
        "labels": rng.randint(4, vocab_size, size=(batch, label_len)).astype(
            np.int32
        ),
        "label_lengths": np.full((batch,), label_len, np.int32),
    }

    mesh = None
    if n_chips > 1:
        from asr_chinese_e2e_tpu.parallel.sharding import (
            batch_sharding,
            make_mesh,
            replicated,
        )

        mesh = make_mesh(data=n_chips)
        # custom kernels (fused attention) shard over the mesh via
        # shard_map; re-wrap the step so tracing sees the mesh context
        from asr_chinese_e2e_tpu.parallel.context import active_mesh

        _raw_step = train_step

        def train_step(state, *a):
            with active_mesh(mesh):
                return _raw_step(state, *a)

    t0 = time.perf_counter()
    state = init_fn(jax.random.PRNGKey(0), host_batch)
    log(f"init: {time.perf_counter() - t0:.1f}s")

    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))
        sh = batch_sharding(mesh)
        args = [
            jax.device_put(host_batch[k], sh)
            for k in ("wave", "wave_lengths", "labels", "label_lengths")
        ]
    else:
        args = [
            jax.device_put(host_batch[k])
            for k in ("wave", "wave_lengths", "labels", "label_lengths")
        ]
    step_rng = jax.random.key(1, impl=tcfg.get("rng_impl", "rbg"))

    spd = int(steps_per_dispatch)
    if spd > 1:
        from asr_chinese_e2e_tpu.train.train_step import make_multi_step

        multi = make_multi_step(train_step)
        stacked_host = {
            k: np.broadcast_to(np.asarray(host_batch[k]),
                               (spd,) + host_batch[k].shape).copy()
            for k in ("wave", "wave_lengths", "labels", "label_lengths")
        }
        if mesh is not None:
            # batch axis (axis 1) must shard over `data` like the trainer's
            # put_host_batch_stacked — plain device_put would commit the
            # stack to one device and clash with the replicated state
            from asr_chinese_e2e_tpu.parallel.sharding import (
                put_host_batch_stacked,
            )

            put = put_host_batch_stacked(mesh, stacked_host)
        else:
            put = {k: jax.device_put(v) for k, v in stacked_host.items()}
        stacked = [put[k] for k in (
            "wave", "wave_lengths", "labels", "label_lengths")]

        def train_step(state, *a):  # noqa: F811 — same call shape
            return multi(state, *stacked, a[-1])

    t0 = time.perf_counter()
    state, metrics = train_step(state, *args, step_rng)
    jax.block_until_ready(metrics["loss"])
    loss0 = float(np.asarray(metrics["loss"]).reshape(-1)[-1])
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s loss={loss0:.3f}")

    # warmup
    for _ in range(2):
        state, metrics = train_step(state, *args, step_rng)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = train_step(state, *args, step_rng)
    jax.block_until_ready(metrics["loss"])
    wall = time.perf_counter() - t0

    steps_per_s = n_steps * spd / wall
    audio_s_per_s_per_chip = steps_per_s * batch * seconds / n_chips
    loss_f = float(np.asarray(metrics["loss"]).reshape(-1)[-1])
    log(
        f"{n_steps * spd} steps in {wall:.2f}s -> {steps_per_s:.2f} steps/s, "
        f"{audio_s_per_s_per_chip:.1f} audio-s/s/chip (loss={loss_f:.3f})"
    )

    print(
        json.dumps(
            {
                "metric": "train_throughput_audio_seconds_per_sec_per_chip",
                "value": round(audio_s_per_s_per_chip, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    from asr_chinese_e2e_tpu.utils.cli import parse_kwargs

    _, kwargs = parse_kwargs(sys.argv[1:])
    main(**kwargs)
