"""Ring attention vs plain attention on the virtual mesh (SURVEY §5.7)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from asr_chinese_e2e_tpu.ops.ring_attention import ring_attention
from asr_chinese_e2e_tpu.parallel.sharding import make_mesh


def reference_attention(q, k, v, key_valid):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bqhd,bkhd->bqhk", q, k) * scale
    valid = jnp.arange(k.shape[1])[None, :] < key_valid[:, None]
    s = s + jnp.where(valid, 0.0, -1e9)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqhk,bkhd->bqhd", p, v)


def run_ring(q, k, v, key_valid, n_seq):
    mesh = make_mesh(data=-1, seq=n_seq)
    fn = shard_map(
        lambda q_, k_, v_, kv: ring_attention(q_, k_, v_, kv, "seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"), P()),
        out_specs=P(None, "seq"),
        check_vma=False,
    )
    return fn(q, k, v, key_valid)


def make_qkv(seed=0, B=2, T=16, H=2, D=8):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, T, H, D).astype(np.float32))
    return mk(), mk(), mk()


def test_ring_matches_full_attention():
    q, k, v = make_qkv()
    key_valid = jnp.asarray([16, 16])
    want = reference_attention(q, k, v, key_valid)
    got = run_ring(q, k, v, key_valid, n_seq=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_ring_with_variable_lengths():
    q, k, v = make_qkv(seed=1)
    key_valid = jnp.asarray([11, 5])  # masks cross shard boundaries (T/4=4)
    want = reference_attention(q, k, v, key_valid)
    got = run_ring(q, k, v, key_valid, n_seq=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_ring_degenerate_single_shard():
    q, k, v = make_qkv(seed=2)
    key_valid = jnp.asarray([16, 9])
    want = reference_attention(q, k, v, key_valid)
    got = run_ring(q, k, v, key_valid, n_seq=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
