"""Distributed rescoring collectives on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from asr_chinese_e2e_tpu.decode.distributed import make_sharded_rescorer
from asr_chinese_e2e_tpu.parallel.sharding import make_mesh


def test_distributed_rescore_matches_local():
    mesh = make_mesh()  # 8-way data
    rng = np.random.RandomState(0)
    B, K = 16, 5
    ctc = jnp.asarray(rng.randn(B, K).astype(np.float32))
    att = jnp.asarray(rng.randn(B, K).astype(np.float32))
    lam = 0.3

    rescorer = make_sharded_rescorer(mesh)
    global_scores, best = rescorer(ctc, att, jnp.float32(lam))

    want = lam * np.asarray(ctc) + (1 - lam) * np.asarray(att)
    np.testing.assert_allclose(np.asarray(global_scores), want, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(best), want.argmax(-1))


def test_exchange_scores_assembles_global_tile():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from asr_chinese_e2e_tpu.decode.distributed import exchange_scores

    mesh = make_mesh()
    B, K = 8, 3
    scores = jnp.arange(B * K, dtype=jnp.float32).reshape(B, K)

    fn = shard_map(
        lambda s: exchange_scores(s, "data"),
        mesh=mesh,
        in_specs=(P("data"),),
        out_specs=P(),  # replicated global result on every device
        check_vma=False,
    )
    out = fn(scores)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(scores))
