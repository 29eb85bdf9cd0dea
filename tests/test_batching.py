"""Bucketed loader: static shapes, drop_last, determinism, host sharding."""

import numpy as np

from asr_chinese_e2e_tpu.data.batching import BucketedLoader
from asr_chinese_e2e_tpu.data.manifest import write_manifest
from asr_chinese_e2e_tpu.data.vocab import Vocab

from tests.test_manifest import write_wav


def setup_data(tmp_path, n_short=10, n_long=7):
    records = []
    for i in range(n_short):
        p = str(tmp_path / f"s{i}.wav")
        write_wav(p, n_samples=16000)  # 1 s -> 2 s bucket
        records.append({"wave": p, "tgt": "你好", "frames": 16000})
    for i in range(n_long):
        p = str(tmp_path / f"l{i}.wav")
        write_wav(p, n_samples=48000)  # 3 s -> 4 s bucket
        records.append({"wave": p, "tgt": "世界你好", "frames": 48000})
    mpath = str(tmp_path / "train.jsonl")
    write_manifest(mpath, records)
    v = Vocab()
    v.consume_sentence_list(["你好世界"])
    return mpath, v.build()


def test_static_bucket_shapes_and_drop_last(tmp_path):
    mpath, vocab = setup_data(tmp_path)
    loader = BucketedLoader(mpath, vocab, batch_size=4, max_target_len=8, seed=1)
    batches = list(loader.epoch(0))
    # 10 short -> 2 full batches of 4 (2 dropped); 7 long -> 1 batch (3 dropped)
    assert len(batches) == 3 == len(loader)
    for b in batches:
        assert b.wave.shape[0] == 4
        assert b.wave.shape[1] == b.bucket  # padded to bucket boundary
        assert b.bucket in (32000, 64000)
        assert b.labels.shape == (4, 8)
        assert (b.wave_lengths <= b.bucket).all()


def test_epoch_determinism_and_reshuffle(tmp_path):
    mpath, vocab = setup_data(tmp_path)
    loader = BucketedLoader(mpath, vocab, batch_size=2, max_target_len=8, seed=7)
    a = [b.texts for b in loader.epoch(3)]
    b = [b.texts for b in loader.epoch(3)]
    c = [b.texts for b in loader.epoch(4)]
    assert a == b  # same epoch -> identical stream
    assert a != c  # different epoch -> reshuffled


def test_host_sharding_disjoint_and_complete(tmp_path):
    mpath, vocab = setup_data(tmp_path, n_short=12, n_long=0)
    seen = []
    for host in range(2):
        loader = BucketedLoader(
            mpath, vocab, batch_size=2, max_target_len=8, seed=5,
            num_hosts=2, host_id=host, shuffle=True,
        )
        for batch in loader.epoch(0):
            seen.extend(batch.wave_lengths.tolist())
    # 12 utts split 6/6, all consumed exactly once across hosts
    assert len(seen) == 12


def test_wave_normalised(tmp_path):
    mpath, vocab = setup_data(tmp_path)
    loader = BucketedLoader(mpath, vocab, batch_size=4, max_target_len=8)
    batch = next(iter(loader.epoch(0)))
    assert np.abs(batch.wave).max() <= 1.0
    assert batch.wave.dtype == np.float32


def test_label_ids_roundtrip(tmp_path):
    mpath, vocab = setup_data(tmp_path)
    loader = BucketedLoader(mpath, vocab, batch_size=4, max_target_len=8)
    batch = next(iter(loader.epoch(0)))
    for i, text in enumerate(batch.texts):
        ids = batch.labels[i, : batch.label_lengths[i]].tolist()
        assert vocab.ids_to_str(ids).replace(" ", "") == text
