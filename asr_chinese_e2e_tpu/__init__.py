"""asr_chinese_e2e_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Mandarin
end-to-end ASR framework.

Built from scratch with the capabilities of the reference repo
``zqs01/ASR_chinese_e2e`` (see SURVEY.md), redesigned TPU-first:

- host data pipeline feeding static-shape, length-bucketed batches;
- log-mel fbank / CMVN / LFR / SpecAugment computed on device (jnp +
  Pallas kernels);
- flax Transformer & BiLSTM encoders, attention decoder, CTC head;
- hybrid CTC / label-smoothed-CE training with Noam-Adam, grad clip;
- jitted train step sharded over a ``jax.sharding.Mesh`` (data / model
  / seq axes), collectives compiled by XLA onto ICI;
- fixed-shape batched beam search with KV cache on device.
"""

__version__ = "0.1.0"
