"""Debug / tracing / sanitizer subsystem (SURVEY §5.1-5.2).

The reference's only visibility is tqdm bars (``trainer11.py:54,74``) and
its only sanitizers are a nan-loss raise (``example_model.py:34-35``) and an
inf assert (``transformer_official.py:88``). Here:

- ``profile_trace``: context manager around ``jax.profiler`` — xprof-
  compatible traces for any code region (enable in the trainer with
  ``profile_steps``);
- ``debug_mode``: turns on ``jax_debug_nans`` / ``jax_disable_jit`` for
  post-mortem debugging;
- the nan-loss guard itself lives in the trainer
  (``trainer.py`` train_epoch, mirroring the reference behavior).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture an xprof trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """Enable JAX debug flags for the enclosed region."""
    ctx = contextlib.ExitStack()
    with ctx:
        if nans:
            ctx.enter_context(jax.debug_nans(True))
        if disable_jit:
            ctx.enter_context(jax.disable_jit())
        yield


def annotate(name: str):
    """Named profiler span (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)
