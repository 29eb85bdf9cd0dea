"""Checkpoint / resume with best-pointer tracking (orbax-backed, async).

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

TPU-production posture (SURVEY §5.4):

- **Async save**: ``save()`` stages device arrays to host (orbax
  ``AsyncCheckpointer`` does this synchronously, so the train step's
  donated buffers are safe to reuse immediately) and serializes in a
  background thread — the hot loop never blocks on filesystem IO. The
  barrier moves to the *next* save / restore / explicit ``wait()``.
- **Crash consistency**: ``index.json`` (latest/best pointers) is only
  updated AFTER the async commit finishes (``_finalize_pending``), so a
  crash mid-save can never leave ``latest`` pointing at a torn
  checkpoint — restart-from-latest always restores the last *committed*
  state.
- **Multi-host safety**: every process participates in the orbax save
  (it coordinates sharded writes itself), but ``meta.json`` /
  ``index.json`` writes and GC deletion run on process 0 only — no racing
  writers on a shared filesystem.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from ..core.config import Config
from .train_step import TrainState


def _metric_better(reference: str, new: float, old: Optional[float]) -> bool:
    if old is None:
        return True
    return new < old if reference.startswith("-") else new > old


def _is_proc0() -> bool:
    return jax.process_index() == 0


# drain in-flight async saves before interpreter teardown — otherwise
# orbax's background commit threads race Python shutdown and die noisily
# (and the last checkpoint of a run could be torn)
import atexit
import weakref

_LIVE_MANAGERS: "weakref.WeakSet[CheckpointManager]" = weakref.WeakSet()


@atexit.register
def _drain_live_managers() -> None:
    for mgr in list(_LIVE_MANAGERS):
        try:
            mgr.wait()
        except Exception:
            pass


class CheckpointManager:
    def __init__(self, directory: str, reference: str = "-loss", max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.reference = reference
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._mgr_opts = max_to_keep
        self._index_path = os.path.join(self.directory, "index.json")
        self._index = self._load_index()
        self._pending: Optional[dict] = None  # save in flight, not yet indexed
        _LIVE_MANAGERS.add(self)

    def _load_index(self) -> dict:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return {"latest": None, "best": None, "best_metric": None, "all": []}

    def _write_index(self) -> None:
        if not _is_proc0():
            return
        tmp = self._index_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._index, f, indent=2)
        os.replace(tmp, self._index_path)  # atomic pointer update

    def _step_dir(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(
        self,
        state: TrainState,
        epoch: int,
        config: Config | None = None,
        vocab_fingerprint: str | None = None,
        metric: float | None = None,
        step: int | None = None,
    ) -> str:
        """Start an async save; returns immediately after device→host
        staging. The previous save (if still in flight) is drained first —
        at most one outstanding save, which also finalizes its index entry.

        ``step``: host-tracked step count; pass it to avoid the
        ``int(state.step)`` device fetch (on a remote-TPU link a fetch
        racing compile/dispatch RPCs can stall — BENCH_NOTES r3)."""
        self.wait()
        if step is None:
            step = int(state.step)
        # file naming parity: e{epoch}_s{step} (trainer11.py:93-99)
        name = f"e{epoch}_s{step}"
        path = self._step_dir(name)
        tree = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": epoch,
            "metric_sums": state.metric_sums,
        }
        self._ckptr.save(os.path.join(path, "state"), tree, force=True)
        if _is_proc0():
            os.makedirs(path, exist_ok=True)  # orbax commits `state` later
            meta = {
                "epoch": epoch,
                "step": step,
                "vocab_fingerprint": vocab_fingerprint,
                "config": config.to_dict() if config is not None else None,
                "metric": metric,
            }
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f, indent=2, default=str)
        self._pending = {"name": name, "metric": metric}
        return path

    def wait(self) -> None:
        """Block until the in-flight save (if any) commits, then publish its
        index entry (latest/best pointers) and GC old checkpoints."""
        self._ckptr.wait_until_finished()
        if self._pending is not None:
            self._finalize_pending()

    def _finalize_pending(self) -> None:
        name, metric = self._pending["name"], self._pending["metric"]
        self._pending = None
        self._index["latest"] = name
        if name not in self._index["all"]:
            self._index["all"].append(name)
        if metric is not None and _metric_better(
            self.reference, metric, self._index["best_metric"]
        ):
            self._index["best"] = name
            self._index["best_metric"] = metric
        self._gc()
        self._write_index()

    def _gc(self) -> None:
        keep = set(
            n for n in (self._index["latest"], self._index["best"]) if n
        )
        extra = [n for n in self._index["all"] if n not in keep]
        while len(extra) + len(keep) > self._mgr_opts and extra:
            victim = extra.pop(0)
            self._index["all"].remove(victim)
            if _is_proc0():
                vdir = self._step_dir(victim)
                if os.path.isdir(vdir):
                    import shutil

                    shutil.rmtree(vdir)

    def restore(
        self, which: str = "latest", template: TrainState | None = None
    ) -> tuple[TrainState, dict]:
        """Restore ('latest' | 'best' | explicit 'e{E}_s{S}' name).

        ``template`` (an abstract-or-concrete TrainState with the right
        structure) is required for sharded/typed restore."""
        self.wait()  # never read past a save still in flight
        if which in ("latest", "best"):
            # disk is the source of truth: a fresh manager on a non-zero
            # process may hold a stale in-memory index (only process 0
            # writes index.json). Multi-process, briefly poll for the
            # pointer — process 0 publishes it after the orbax commit
            # barrier, so other processes can arrive here first.
            deadline = time.time() + (30.0 if jax.process_count() > 1 else 0.0)
            while True:
                self._index = self._load_index()
                name = self._index.get(which)
                if name is not None or time.time() >= deadline:
                    break
                time.sleep(0.25)
        else:
            name = which
        if name is None:
            raise FileNotFoundError(f"no '{which}' checkpoint in {self.directory}")
        path = self._step_dir(name)
        target = None
        if template is not None:
            target = {
                "params": template.params,
                "opt_state": template.opt_state,
                "step": template.step,
                "epoch": 0,
                "metric_sums": template.metric_sums,
            }
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        tree = self._ckptr.restore(os.path.join(path, "state"), args=ocp.args.StandardRestore(target) if target is not None else None)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        sums = tree.get("metric_sums")
        if sums is None and template is not None:
            # pre-metric_sums checkpoint: resume with zeroed sums
            sums = jax.tree.map(jnp.zeros_like, template.metric_sums)
        state = TrainState(
            params=tree["params"],
            opt_state=tree["opt_state"],
            step=tree["step"],
            metric_sums=sums,
        )
        return state, meta

    @property
    def latest_name(self) -> Optional[str]:
        self.wait()
        return self._index["latest"]

    @property
    def best_name(self) -> Optional[str]:
        self.wait()
        return self._index["best"]
