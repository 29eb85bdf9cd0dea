"""BiLSTM/LAS model family: shapes, masking, decode-step consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from asr_chinese_e2e_tpu.core.registry import available_models, get_model
from asr_chinese_e2e_tpu.models.rnn import (
    LAS,
    BiLSTMCTC,
    default_ctc_config,
    default_las_config,
)

VOCAB = 16


def make_batch(b=2, t=7, l=4, input_dim=10, seed=0):
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(b, t, input_dim).astype(np.float32))
    feat_lens = jnp.asarray([t, t - 2][:b])
    labels = jnp.asarray(rng.randint(4, VOCAB, size=(b, l)))
    label_lens = jnp.asarray([l, l - 2][:b])
    labels = labels * (jnp.arange(l)[None, :] < label_lens[:, None])
    return feats, feat_lens, labels, label_lens


def test_bilstm_ctc_shapes_and_masking():
    cfg = default_ctc_config().build(hidden_size=12, input_dim=10, dropout_rate=0.0)
    model = BiLSTMCTC(cfg, VOCAB)
    feats, feat_lens, labels, label_lens = make_batch()
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, labels, label_lens)
    out = model.apply(params, feats, feat_lens, labels, label_lens)
    assert out["ctc_logits"].shape == (2, 7, VOCAB)
    # padded frames must not affect valid outputs
    feats2 = feats.at[1, 5:].set(50.0)
    out2 = model.apply(params, feats2, feat_lens, labels, label_lens)
    np.testing.assert_allclose(
        np.asarray(out["ctc_logits"])[1, :5],
        np.asarray(out2["ctc_logits"])[1, :5],
        atol=1e-5,
    )


def test_las_forward_and_step_consistency():
    cfg = default_las_config().build(
        hidden_size=16,
        embed_dim=12,
        attention_dim=12,
        input_dim=10,
        num_encoder_layers=1,
        dropout_rate=0.0,
        location_kernel=5,
    )
    model = LAS(cfg, VOCAB)
    feats, feat_lens, labels, label_lens = make_batch()
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, labels, label_lens)
    out = model.apply(params, feats, feat_lens, labels, label_lens)
    assert out["logits"].shape == (2, 5, VOCAB)
    assert out["ctc_logits"].shape == (2, 7, VOCAB)

    # step path reproduces teacher-forced logits given the same prefix
    enc_out, enc_lens = model.apply(params, feats, feat_lens, method="encode")
    state = model.apply(params, enc_out, enc_lens, method="init_decode_state")
    from asr_chinese_e2e_tpu.models.transformer import preprocess_targets

    ys_in, _ = preprocess_targets(labels, label_lens)
    want = np.asarray(jax.nn.log_softmax(out["logits"], axis=-1))
    for i in range(ys_in.shape[1]):
        logp, state = model.apply(params, ys_in[:, i], state, method="decode_step")
        np.testing.assert_allclose(np.asarray(logp), want[:, i], rtol=1e-4, atol=1e-5)


def test_registry_contract():
    names = available_models()
    for required in [
        "SpeechTransformer",
        "TransformerOffical",  # reference alias (main.py:103)
        "BiLSTMCTC",
        "LAS",
        "ExampleModel",
    ]:
        assert required in names
    cls, cfg_fn = get_model("BiLSTMCTC")
    assert cls is BiLSTMCTC and "hidden_size" in cfg_fn()


def test_example_model_runs():
    cls, cfg_fn = get_model("ExampleModel")
    cfg = cfg_fn().build(input_dim=10)
    model = cls(cfg, VOCAB)
    feats, feat_lens, labels, label_lens = make_batch()
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, labels, label_lens)
    out = model.apply(params, feats, feat_lens, labels, label_lens)
    assert out["logits"].shape == (2, 5, VOCAB)
