"""Nested config tree.

The reference configures experiments through nested "variant" dicts assembled
in the entry scripts and serialized to ``variant.json``
(reference: examples/iql/mujoco_finetune.py:171-356,
rlkit/launchers/launcher_util.py:263-268). We keep the same shape — a nested
mapping with the same key names (``algo_kwargs``, ``trainer_kwargs``, ...) so
shipped variant files remain meaningful — but give it attribute access,
deep-update semantics and JSON round-tripping.
"""

from __future__ import annotations

import copy
import json
from typing import Any, Mapping


class Config(dict):
    """A dict with attribute access that recursively wraps nested mappings.

    >>> c = Config(trainer_kwargs=dict(discount=0.99))
    >>> c.trainer_kwargs.discount
    0.99
    """

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__()
        data: dict = dict(*args, **kwargs)
        for k, v in data.items():
            self[k] = v

    # -- item/attr protocol ------------------------------------------------
    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, _wrap(value))

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:  # pragma: no cover - attribute protocol
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __delattr__(self, key: str) -> None:
        del self[key]

    # -- functional helpers ------------------------------------------------
    def deep_update(self, other: Mapping[str, Any]) -> "Config":
        """Recursively merge ``other`` into a copy of self and return it."""
        out = copy.deepcopy(self)
        _deep_update_inplace(out, other)
        return out

    def flatten(self, sep: str = ".") -> dict:
        """Flatten into {"a.b.c": leaf} — handy for sweepers and logging."""
        flat: dict = {}

        def rec(prefix: str, node: Any) -> None:
            if isinstance(node, Mapping):
                for k, v in node.items():
                    rec(f"{prefix}{sep}{k}" if prefix else str(k), v)
            else:
                flat[prefix] = node

        rec("", self)
        return flat

    def to_dict(self) -> dict:
        return json.loads(self.to_json())

    def to_json(self, **kwargs: Any) -> str:
        kwargs.setdefault("indent", 2)
        kwargs.setdefault("sort_keys", True)
        kwargs.setdefault("default", _json_default)
        return json.dumps(self, **kwargs)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls(json.loads(s))

    def set_path(self, dotted: str, value: Any) -> None:
        """Set a value by dotted path, creating intermediate Configs."""
        node = self
        *parents, leaf = dotted.split(".")
        for p in parents:
            if p not in node or not isinstance(node[p], Config):
                node[p] = Config()
            node = node[p]
        node[leaf] = value

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for p in dotted.split("."):
            if not isinstance(node, Mapping) or p not in node:
                return default
            node = node[p]
        return node


def _wrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value
    if isinstance(value, Mapping):
        return Config(value)
    if isinstance(value, (list, tuple)):
        return type(value)(_wrap(v) for v in value)
    return value


def _deep_update_inplace(dst: Config, src: Mapping[str, Any]) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], Mapping) and isinstance(v, Mapping):
            _deep_update_inplace(dst[k], v)
        else:
            dst[k] = v


def _json_default(o: Any) -> Any:
    # numpy scalars / arrays and anything else stringifiable
    if hasattr(o, "item") and callable(o.item):
        try:
            return o.item()
        except Exception:
            pass
    if hasattr(o, "tolist") and callable(o.tolist):
        try:
            return o.tolist()
        except Exception:
            pass
    return repr(o)
