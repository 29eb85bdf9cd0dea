"""Checkpoint / resume with best-pointer tracking (orbax-backed).

The reference saves ``ckpt/<exp>/e{epoch}_s{step}.model`` + ``.opt`` pairs
(``Trainer/trainer11.py:93-99``) and can restore model+optimizer+counters
(``trainer11.py:82-91``) but the CLI plumbing was left TODO (``main.py:28``)
and best-ckpt logic is commented out (``trainer11.py:100-106``). This module
finishes that design as one checkpoint tree:

    {params, opt_state, step, epoch}  (orbax pytree)
  + meta.json {config, vocab_fingerprint, feature config}  — the content of
    the reference's richest schema (``transformer.py:86-117`` serialize
    package: all hyperparams + LFR config + state + optim)

with ``latest`` / ``best`` tracking driven by ``reference='-loss'``
semantics (``trainer11.py:26,43``: '-' prefix means lower is better).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from ..core.config import Config
from .train_step import TrainState


def _metric_better(reference: str, new: float, old: Optional[float]) -> bool:
    if old is None:
        return True
    return new < old if reference.startswith("-") else new > old


class CheckpointManager:
    def __init__(self, directory: str, reference: str = "-loss", max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.reference = reference
        self._ckptr = ocp.StandardCheckpointer()
        self._mgr_opts = max_to_keep
        self._index_path = os.path.join(self.directory, "index.json")
        self._index = self._load_index()

    def _load_index(self) -> dict:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return {"latest": None, "best": None, "best_metric": None, "all": []}

    def _write_index(self) -> None:
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=2)

    def _step_dir(self, epoch: int, step: int) -> str:
        # file naming parity: e{epoch}_s{step} (trainer11.py:93-99)
        return os.path.join(self.directory, f"e{epoch}_s{step}")

    def save(
        self,
        state: TrainState,
        epoch: int,
        config: Config | None = None,
        vocab_fingerprint: str | None = None,
        metric: float | None = None,
    ) -> str:
        step = int(state.step)
        path = self._step_dir(epoch, step)
        tree = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": epoch,
        }
        self._ckptr.save(os.path.join(path, "state"), tree, force=True)
        self._ckptr.wait_until_finished()
        meta = {
            "epoch": epoch,
            "step": step,
            "vocab_fingerprint": vocab_fingerprint,
            "config": config.to_dict() if config is not None else None,
            "metric": metric,
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)

        name = os.path.basename(path)
        self._index["latest"] = name
        self._index["all"].append(name)
        if metric is not None and _metric_better(
            self.reference, metric, self._index["best_metric"]
        ):
            self._index["best"] = name
            self._index["best_metric"] = metric
        self._gc()
        self._write_index()
        return path

    def _gc(self) -> None:
        keep = set(
            n for n in (self._index["latest"], self._index["best"]) if n
        )
        extra = [n for n in self._index["all"] if n not in keep]
        while len(extra) + len(keep) > self._mgr_opts and extra:
            victim = extra.pop(0)
            self._index["all"].remove(victim)
            vdir = os.path.join(self.directory, victim)
            if os.path.isdir(vdir):
                import shutil

                shutil.rmtree(vdir)

    def restore(
        self, which: str = "latest", template: TrainState | None = None
    ) -> tuple[TrainState, dict]:
        """Restore ('latest' | 'best' | explicit 'e{E}_s{S}' name).

        ``template`` (an abstract-or-concrete TrainState with the right
        structure) is required for sharded/typed restore."""
        name = self._index.get(which, None) if which in ("latest", "best") else which
        if name is None:
            raise FileNotFoundError(f"no '{which}' checkpoint in {self.directory}")
        path = self._step_dir(0, 0).replace("e0_s0", name)
        target = None
        if template is not None:
            target = {
                "params": template.params,
                "opt_state": template.opt_state,
                "step": template.step,
                "epoch": 0,
            }
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        tree = self._ckptr.restore(os.path.join(path, "state"), target)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        state = TrainState(
            params=tree["params"], opt_state=tree["opt_state"], step=tree["step"]
        )
        return state, meta

    @property
    def latest_name(self) -> Optional[str]:
        return self._index["latest"]

    @property
    def best_name(self) -> Optional[str]:
        return self._index["best"]
