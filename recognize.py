#!/usr/bin/env python
"""Inference CLI: decode wavs / a manifest with a trained experiment.

The real implementation of what the reference left as a stub
(``Predictor/predictor.py:7-35``). Output n-best JSON follows the
kaldi-style assembly of ``Predictor/Models/utils.py:34-94``
(``add_results_to_json``): {"utts": {id: {"output": [{"rec_text",
"rec_token", "score", "text"?}]}}}.

    python recognize.py --exp ckpt/<name> --vocab data/vocab.json \
        --manifest data/test.jsonl --mode beam --beam_size 10 \
        --out results.json

Modes: ctc_greedy | attention_greedy | beam | rescore | joint
(``rescore`` = CTC-prefix beam + attention rescoring, north-star #4;
``joint`` = one-pass joint CTC/attention beam — score interpolation at
every step, the hybrid architecture's strongest decode).
"""

from __future__ import annotations

import json
import sys

import jax.numpy as jnp
import numpy as np

from asr_chinese_e2e_tpu.data.batching import load_wav
from asr_chinese_e2e_tpu.data.features import parse_batch
from asr_chinese_e2e_tpu.data.manifest import read_manifest
from asr_chinese_e2e_tpu.decode.beam import beam_search
from asr_chinese_e2e_tpu.decode.cer import corpus_cer
from asr_chinese_e2e_tpu.decode.ctc_prefix import (
    attention_rescore,
    ctc_prefix_beam_batch,
)
from asr_chinese_e2e_tpu.decode.greedy import (
    attention_greedy_decode,
    ctc_greedy_decode,
    tokens_to_ids,
)
from asr_chinese_e2e_tpu.utils.cli import parse_kwargs
from asr_chinese_e2e_tpu.utils.experiment import load_experiment


def batched(records, batch_size, max_samples):
    for i in range(0, len(records), batch_size):
        chunk = records[i : i + batch_size]
        waves = [load_wav(r["wave"])[:max_samples] for r in chunk]
        s = max(len(w) for w in waves)
        wave = np.zeros((len(chunk), s), np.float32)
        lengths = np.zeros((len(chunk),), np.int32)
        for j, w in enumerate(waves):
            wave[j, : len(w)] = w
            lengths[j] = len(w)
        yield chunk, wave, lengths


def recognize(
    exp: str,
    vocab: str,
    manifest: str = None,
    wav: str = None,
    mode: str = "beam",
    which: str = "best",
    beam_size: int = 10,
    nbest: int = 1,
    max_decode_len: int = 64,
    batch_size: int = 8,
    max_seconds: float = 15.0,
    ctc_weight: float = 0.3,
    length_penalty: float = 0.0,
    ctc_beam_impl: str = "device",  # on-chip prefix beam (host = exact ref)
    ctc_prune: int = 30,  # joint mode: CTC-scored candidates per hyp
    out: str = None,
    **_,
):
    model, params, cfg, feat_cfg, voc = load_experiment(exp, vocab, which)
    if manifest:
        records = read_manifest(manifest)
    elif wav:
        records = [{"wave": w} for w in wav.split(",")]
    else:
        raise SystemExit("need --manifest or --wav")

    results = {"utts": {}}
    hyps_all, refs_all = [], []
    max_samples = int(max_seconds * feat_cfg.sample_rate)
    for chunk, wave, lengths in batched(records, batch_size, max_samples):
        feats, feat_lens = parse_batch(
            jnp.asarray(wave), jnp.asarray(lengths), feat_cfg
        )
        enc_out, enc_lens = model.apply(params, feats, feat_lens, method="encode")

        nbest_out = []  # per utt: [(ids, score)]
        if mode == "ctc_greedy":
            lp = model.apply(params, enc_out, method="ctc_log_probs")
            for ids in ctc_greedy_decode(lp, enc_lens):
                nbest_out.append([(ids, 0.0)])
        elif mode == "attention_greedy":
            tokens, scores = attention_greedy_decode(
                model, params, enc_out, enc_lens, max_decode_len
            )
            for ids, s in zip(tokens_to_ids(tokens), np.asarray(scores)):
                nbest_out.append([(ids, float(s))])
        elif mode == "beam":
            res = beam_search(
                model, params, enc_out, enc_lens, beam_size, max_decode_len,
                length_penalty,
            )
            ids_nb = res.nbest_ids(nbest)
            for b in range(len(chunk)):
                nbest_out.append(
                    [(ids_nb[b][k], float(res.scores[b, k])) for k in range(len(ids_nb[b]))]
                )
        elif mode == "joint":
            # one-pass joint CTC/attention beam (strongest hybrid decode)
            from asr_chinese_e2e_tpu.decode.joint import joint_beam_search

            res = joint_beam_search(
                model, params, enc_out, enc_lens, beam_size, max_decode_len,
                ctc_weight=ctc_weight, ctc_prune=ctc_prune,
            )
            ids_nb = res.nbest_ids(nbest)
            for b in range(len(chunk)):
                nbest_out.append(
                    [(ids_nb[b][k], float(res.scores[b, k])) for k in range(len(ids_nb[b]))]
                )
        elif mode == "rescore":
            lp = model.apply(params, enc_out, method="ctc_log_probs")
            if ctc_beam_impl == "device":
                from asr_chinese_e2e_tpu.decode.ctc_prefix_device import (
                    ctc_prefix_beam_device,
                    device_nbest_to_lists,
                )

                pref, plen, sc = ctc_prefix_beam_device(
                    lp, enc_lens, beam_size=beam_size
                )
                ctc_nbest = device_nbest_to_lists(pref, plen, sc)
            else:
                ctc_nbest = ctc_prefix_beam_batch(
                    np.asarray(lp), np.asarray(enc_lens), beam_size
                )
            best = attention_rescore(
                model, params, enc_out, enc_lens, ctc_nbest, ctc_weight
            )
            for ids in best:
                nbest_out.append([(ids, 0.0)])
        else:
            raise SystemExit(f"unknown mode {mode}")

        for record, hyps in zip(chunk, nbest_out):
            utt_id = record["wave"].rsplit("/", 1)[-1].rsplit(".", 1)[0]
            outputs = []
            for rank, (ids, score) in enumerate(hyps, 1):
                toks = voc.ids_to_tokens(ids)
                entry = {
                    "rec_text": "".join(toks),
                    "rec_token": " ".join(toks),
                    "score": score,
                }
                if "tgt" in record:
                    entry["text"] = record["tgt"]
                outputs.append(entry)
            results["utts"][utt_id] = {"output": outputs}
            best_text = outputs[0]["rec_text"]
            print(f"{utt_id}\t{best_text}")
            if "tgt" in record:
                hyps_all.append(best_text)
                refs_all.append(record["tgt"])

    if refs_all:
        cer = corpus_cer(hyps_all, refs_all)
        print(f"# CER: {cer:.2f}% over {len(refs_all)} utts", file=sys.stderr)
        results["cer"] = cer
    if out:
        with open(out, "w", encoding="utf-8") as f:
            json.dump(results, f, ensure_ascii=False, indent=2)
        print(f"# wrote {out}", file=sys.stderr)
    return results


def main():
    _, kwargs = parse_kwargs(sys.argv[1:])
    if kwargs.pop("help", False) or not kwargs:
        print(__doc__)
        return
    recognize(**kwargs)


if __name__ == "__main__":
    main()
