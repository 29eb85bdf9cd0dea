"""Distributed-without-a-cluster tests (SURVEY §4 item 3): 8-device
virtual CPU mesh — DP numerical parity, TP sharding rules, collective
correctness, multi-chip dry run."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from asr_chinese_e2e_tpu.data.features import FeatureConfig
from asr_chinese_e2e_tpu.models.transformer import SpeechTransformer
from asr_chinese_e2e_tpu.parallel.sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    param_spec,
    replicated,
)
from asr_chinese_e2e_tpu.train.optimizer import default_train_config, make_optimizer
from asr_chinese_e2e_tpu.train.train_step import make_step_fns

from tests.test_train_step import VOCAB, make_raw_batch
from tests.test_transformer import tiny_cfg


def test_mesh_shapes():
    mesh = make_mesh(data=-1, model=2)
    assert mesh.shape[DATA_AXIS] == 4 and mesh.shape[MODEL_AXIS] == 2
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8


def test_param_spec_rules():
    assert param_spec("encoder/layer0/attn/q/kernel", (64, 4, 16), 2) == P(
        None, MODEL_AXIS, None
    )
    assert param_spec("decoder/layer1/ffn/w1/kernel", (64, 128), 2) == P(
        None, MODEL_AXIS
    )
    assert param_spec("decoder/embed/embedding", (32, 64), 2) == P(MODEL_AXIS, None)
    # indivisible dim -> replicated
    assert param_spec("encoder/layer0/attn/q/kernel", (64, 3, 16), 2) == P()
    # TP off -> replicated
    assert param_spec("encoder/layer0/attn/q/kernel", (64, 4, 16), 1) == P()
    assert param_spec("encoder/input_norm/scale", (64,), 2) == P()


def _build(n_batch, mesh=None, model_axis=1):
    cfg = tiny_cfg(dropout_rate=0.0, ctc_weight=0.3)
    tcfg = default_train_config().combine(cfg)
    model = SpeechTransformer(cfg, VOCAB)
    tx = make_optimizer(tcfg, cfg.d_model)
    init_fn, train_step, eval_step = make_step_fns(
        model, tx, FeatureConfig(), tcfg, raw_features=True
    )
    batch = make_raw_batch(b=n_batch)
    state = init_fn(jax.random.PRNGKey(0), batch)
    return state, train_step, batch


def _args(batch, sharding=None):
    keys = ("wave", "wave_lengths", "labels", "label_lengths")
    if sharding is None:
        return [jnp.asarray(batch[k]) for k in keys]
    return [jax.device_put(batch[k], sharding) for k in keys]


def test_dp_loss_matches_single_device():
    """Data-parallel over 8 devices must produce the same loss/params as
    unsharded execution (XLA inserts the gradient reduction)."""
    state1, train_step, batch = _build(8)
    s1, m1 = train_step(state1, *_args(batch), jax.random.PRNGKey(1))

    mesh = make_mesh()  # 8-way data
    state2, train_step2, _ = _build(8)
    state2 = jax.device_put(state2, replicated(mesh))
    args = _args(batch, batch_sharding(mesh))
    s2, m2 = train_step2(state2, *args, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_forward_matches_replicated():
    """Tensor-parallel (model=2) sharded params must give the same loss."""
    state1, train_step, batch = _build(4)
    _, m1 = train_step(state1, *_args(batch), jax.random.PRNGKey(1))

    mesh = make_mesh(data=-1, model=2)  # 4 data x 2 model
    state2, train_step2, _ = _build(4)
    p_sh = param_shardings(mesh, state2.params)
    state2 = state2.replace(
        params=jax.device_put(state2.params, p_sh),
        opt_state=jax.device_put(state2.opt_state, replicated(mesh)),
        step=jax.device_put(state2.step, replicated(mesh)),
    )
    args = _args(batch, batch_sharding(mesh))
    s2, m2 = train_step2(state2, *args, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # sharded params remain sharded after the update
    q = s2.params["params"]["encoder"]["layer0"]["attn"]["q"]["kernel"]
    assert not q.sharding.is_fully_replicated


def test_psum_of_shard_losses_equals_global():
    """Collective correctness: mean of per-shard CE losses == global CE
    (equal shard sizes)."""
    from asr_chinese_e2e_tpu.losses import smoothed_cross_entropy
    from jax import shard_map

    mesh = make_mesh()
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(8, 4, 6).astype(np.float32))
    gold = jnp.asarray(rng.randint(1, 6, size=(8, 4)))

    global_loss, _ = smoothed_cross_entropy(logits, gold, 0.0)

    def shard_fn(lg, gd):
        loss, _ = smoothed_cross_entropy(lg, gd, 0.0)
        return jax.lax.pmean(loss, DATA_AXIS)[None]

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )(logits, gold)
    np.testing.assert_allclose(
        float(global_loss), float(sharded[0]), rtol=1e-5
    )


def test_fused_attention_sharded_matches_unsharded():
    """The shard_map-wrapped fused attention kernel (data x model sharding
    of the (B, H, T, D) grid) must match the unsharded kernel exactly at
    dropout 0 (it needs no communication — per-(b, h) independence)."""
    from asr_chinese_e2e_tpu.ops.fused_attention import (
        fused_attention,
        fused_attention_sharded,
    )

    rng = np.random.RandomState(0)
    b, h, t, d = 8, 4, 16, 8
    q, k, v = (
        jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) for _ in range(3)
    )
    lengths = jnp.asarray(rng.randint(4, t + 1, size=(b,)), jnp.int32)
    seed = jnp.zeros((), jnp.int32)
    want = fused_attention(q, k, v, lengths, seed, 0.5, 0.0)
    mesh = make_mesh(data=4, model=2)
    got = fused_attention_sharded(mesh, q, k, v, lengths, seed, 0.5, 0.0)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-6)


def test_fused_attention_sharded_grads_match():
    from asr_chinese_e2e_tpu.ops.fused_attention import (
        fused_attention,
        fused_attention_sharded,
    )

    rng = np.random.RandomState(1)
    b, h, t, d = 4, 2, 8, 8
    q, k, v = (
        jnp.asarray(rng.randn(b, h, t, d).astype(np.float32)) for _ in range(3)
    )
    lengths = jnp.full((b,), t, jnp.int32)
    seed = jnp.zeros((), jnp.int32)
    mesh = make_mesh(data=4, model=2)

    def loss_plain(q, k, v):
        return jnp.sum(fused_attention(q, k, v, lengths, seed, 0.5, 0.0) ** 2)

    def loss_sharded(q, k, v):
        return jnp.sum(
            fused_attention_sharded(mesh, q, k, v, lengths, seed, 0.5, 0.0) ** 2
        )

    g1 = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
