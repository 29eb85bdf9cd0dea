"""Decoded-CER eval path in the trainer (eval_decode=ctc_greedy)."""

import json
import os

from tests.test_trainer_e2e import corpus, make_trainer  # noqa: F401


def test_eval_decode_ctc_greedy(corpus, tmp_path):  # noqa: F811
    # rebuild a trainer with eval_decode enabled (the knob is read at
    # construction time)
    trainer2, _ = make_trainer(corpus, str(tmp_path / "exp2"))
    trainer2.cfg.build(eval_decode="ctc_greedy")
    from asr_chinese_e2e_tpu.train.trainer import Trainer

    t = Trainer(
        trainer2.model, trainer2.tx,
        trainer2.cfg, trainer2.feat_cfg, trainer2.vocab,
        train_loader=trainer2.train_loader,
        dev_loader=trainer2.dev_loader,
        test_loader=trainer2.test_loader,
    )
    t.train()
    rows = [json.loads(l) for l in open(os.path.join(t.exp_dir, "scalars.jsonl"))]
    decoded = [r for r in rows if any("decoded_cer" in k for k in r)]
    assert decoded, "decoded_cer scalar missing from eval rows"
    val = [v for r in decoded for k, v in r.items() if "decoded_cer" in k][0]
    assert 0.0 <= val <= 400.0
