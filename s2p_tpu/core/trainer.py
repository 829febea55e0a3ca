"""Trainer / loss protocols + Serializable mixin.

Capability contracts:
- ``Trainer`` ABC (reference: rlkit/core/trainer.py:4-16): train(data) /
  end_epoch / get_snapshot / get_diagnostics — the protocol every trainer
  in s2p_tpu.rl implements.
- ``LossFunction`` (reference: rlkit/core/loss.py): compute_loss protocol.
- ``Serializable`` (reference: rlkit/core/serializable.py): ctor-args
  snapshot mixin so objects can be re-instantiated from snapshots.
"""

from __future__ import annotations

import abc
import copy
from typing import Any, Dict


class Trainer(metaclass=abc.ABCMeta):
    @abc.abstractmethod
    def train(self, data) -> Any:
        ...

    def end_epoch(self, epoch: int) -> None:
        pass

    def get_snapshot(self) -> Dict[str, Any]:
        return {}

    def get_diagnostics(self) -> Dict[str, Any]:
        return {}


class LossFunction(metaclass=abc.ABCMeta):
    @abc.abstractmethod
    def compute_loss(self, batch, skip_statistics: bool = False):
        ...


class Serializable:
    """Capture ctor args at init so the object can be reconstructed
    (``Serializable.quick_init(self, locals())`` pattern)."""

    def quick_init(self, locals_: Dict[str, Any]) -> None:
        if getattr(self, "_serializable_initialized", False):
            return
        args = {
            k: v for k, v in locals_.items()
            if k not in ("self", "__class__")
        }
        self.__args = args
        self._serializable_initialized = True

    def __getstate__(self) -> Dict[str, Any]:
        return {"__args": self.__args}

    def __setstate__(self, d: Dict[str, Any]) -> None:
        obj = type(self)(**d["__args"])
        self.__dict__.update(obj.__dict__)

    @classmethod
    def clone(cls, obj: "Serializable", **kwargs) -> "Serializable":
        args = copy.copy(obj._Serializable__args)
        args.update(kwargs)
        return cls(**args)
