"""plg_pipe plugin registry — custom preprocessor steps by key.

Reference: crates/wp-lang/src/eval/builtins/registry.rs:41-77 and the
engine-side stub src/core/parser/plg_pipes/{factory.rs,stub.rs}. Plugins are
Column -> Column functions (prefer built-in F.* expressions; pandas UDFs if
Python is genuinely needed).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column

_REGISTRY: dict[str, Callable[[Column], Column]] = {}


def register_plg_pipe(key: str, fn: Callable[[Column], Column]) -> None:
    # case-INSENSITIVE names: registry.rs uppercases on both register
    # (line 18) and create (line 23)
    _REGISTRY[key.upper()] = fn


def get_plg_pipe(key: str) -> Callable[[Column], Column]:
    k = key.upper()
    if k not in _REGISTRY:
        raise KeyError(f"plg_pipe {key!r} not registered")
    return _REGISTRY[k]
