"""String-keyed model registry.

Parity with the reference's ``getattr(Models, name)`` selection
(``main.py:38-41``, ``Predictor/Models/__init__.py:1-5``): each entry maps a
name to (ModuleClass, default_config_fn). Reference model names are aliased
to their equivalents here so reference CLI invocations keep working.
"""

from __future__ import annotations

from typing import Callable, Tuple, Type

from .config import Config

_REGISTRY: dict[str, Tuple[type, Callable[[], Config]]] = {}


def register(name: str, model_cls: type, default_config: Callable[[], Config]) -> None:
    _REGISTRY[name] = (model_cls, default_config)


def get_model(name: str) -> Tuple[type, Callable[[], Config]]:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def _populate() -> None:
    from ..models import example, rnn, transformer

    register("SpeechTransformer", transformer.SpeechTransformer, transformer.default_config)
    # reference alias: the variant the reference trains (main.py:103)
    register("TransformerOffical", transformer.SpeechTransformer, transformer.default_config)
    register("Transformer", transformer.SpeechTransformer, transformer.default_config)
    register("BiLSTMCTC", rnn.BiLSTMCTC, rnn.default_ctc_config)
    register("LAS", rnn.LAS, rnn.default_las_config)
    register("ExampleModel", example.ExampleModel, example.default_config)


_populate()
