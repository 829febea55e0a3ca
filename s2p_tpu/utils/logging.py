"""Experiment logger.

Re-implements the observability contract of the reference's global logger
(reference: rlkit/core/logging.py:79-334 and
rlkit/launchers/launcher_util.py:226-318):

- tabular rows -> ``progress.csv`` with the key-set frozen at the first dump
  (mismatching later rows warn and are filled with blanks),
- human-readable table mirrored to stdout + ``debug.log``,
- experiment config -> ``variant.json``,
- per-iteration param snapshots with modes
  ``all | last | gap | gap_and_last | none``.

Design difference vs the reference: snapshots here are pickled pytrees of host
numpy arrays (``jax.device_get`` is applied automatically), so any TrainState
can be snapshotted without a torch-style ``state_dict`` protocol.
"""

from __future__ import annotations

import csv
import datetime
import json
import os
import os.path as osp
import pickle
import sys
from collections import OrderedDict
from typing import Any, Iterable, Mapping, Optional

from s2p_tpu.utils.config import Config

SNAPSHOT_MODES = ("all", "last", "gap", "gap_and_last", "none")


class TerminalTablePrinter:
    @staticmethod
    def format(rows: Iterable[tuple]) -> str:
        rows = [(str(k), str(v)) for k, v in rows]
        if not rows:
            return ""
        kw = max(len(k) for k, _ in rows)
        vw = max(len(v) for _, v in rows)
        sep = "-" * (kw + vw + 7)
        lines = [sep]
        for k, v in rows:
            lines.append(f"| {k.ljust(kw)} | {v.ljust(vw)} |")
        lines.append(sep)
        return "\n".join(lines)


class Logger:
    def __init__(self) -> None:
        self._log_dir: Optional[str] = None
        self._tabular: "OrderedDict[str, Any]" = OrderedDict()
        self._tabular_keys: Optional[list] = None
        self._tabular_prefixes: list = []
        self._csv_file = None
        self._csv_writer = None
        self._text_file = None
        self._snapshot_mode = "gap_and_last"
        self._snapshot_gap = 10
        self._print_tabular = True

    # -- configuration -----------------------------------------------------
    @property
    def log_dir(self) -> Optional[str]:
        return self._log_dir

    def set_log_dir(self, log_dir: str) -> None:
        os.makedirs(log_dir, exist_ok=True)
        self.close()
        self._log_dir = log_dir
        self._tabular_keys = None
        self._csv_file = open(osp.join(log_dir, "progress.csv"), "a", newline="")
        self._text_file = open(osp.join(log_dir, "debug.log"), "a")

    def set_snapshot_mode(self, mode: str) -> None:
        assert mode in SNAPSHOT_MODES, f"unknown snapshot mode {mode!r}"
        self._snapshot_mode = mode

    def set_snapshot_gap(self, gap: int) -> None:
        assert gap >= 1
        self._snapshot_gap = gap

    def set_print_tabular(self, flag: bool) -> None:
        self._print_tabular = flag

    # -- text / config -----------------------------------------------------
    def log(self, msg: str, with_timestamp: bool = True) -> None:
        if with_timestamp:
            now = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
            msg = f"{now} | {msg}"
        print(msg)
        sys.stdout.flush()
        if self._text_file is not None:
            self._text_file.write(msg + "\n")
            self._text_file.flush()

    def log_variant(self, variant: Mapping[str, Any]) -> None:
        assert self._log_dir is not None, "set_log_dir first"
        path = osp.join(self._log_dir, "variant.json")
        cfg = variant if isinstance(variant, Config) else Config(variant)
        with open(path, "w") as f:
            f.write(cfg.to_json())

    # -- tabular -----------------------------------------------------------
    def push_prefix(self, prefix: str) -> None:
        self._tabular_prefixes.append(prefix)

    def pop_prefix(self) -> None:
        self._tabular_prefixes.pop()

    def record_tabular(self, key: str, value: Any) -> None:
        key = "".join(self._tabular_prefixes) + key
        self._tabular[key] = value

    def record_dict(self, d: Mapping[str, Any], prefix: Optional[str] = None) -> None:
        for k, v in d.items():
            self.record_tabular(f"{prefix}{k}" if prefix else k, v)

    def dump_tabular(self, with_prefix: bool = True) -> None:
        if not self._tabular:
            return
        row = dict(self._tabular)
        if self._print_tabular:
            print(TerminalTablePrinter.format(row.items()))
            sys.stdout.flush()
        if self._csv_writer is None and self._csv_file is not None:
            # Freeze the csv key-set on the first dump so later rows stay
            # aligned (reference: rlkit/core/logging.py:282-292).
            self._tabular_keys = list(row.keys())
            self._csv_writer = csv.DictWriter(
                self._csv_file, fieldnames=self._tabular_keys, extrasaction="ignore"
            )
            self._csv_writer.writeheader()
        if self._csv_writer is not None:
            missing = set(self._tabular_keys) - set(row.keys())
            extra = set(row.keys()) - set(self._tabular_keys)
            if missing or extra:
                self.log(
                    "WARNING: tabular key mismatch vs frozen header "
                    f"(missing={sorted(missing)}, extra={sorted(extra)})"
                )
            self._csv_writer.writerow({k: row.get(k, "") for k in self._tabular_keys})
            self._csv_file.flush()
        self._tabular.clear()

    # -- snapshots -----------------------------------------------------------
    def save_itr_params(self, itr: int, params: Any) -> Optional[str]:
        """Snapshot ``params`` (any pytree) per the configured mode.

        Reference semantics: rlkit/core/logging.py:309-331.
        Returns the path written, or None if this iteration is skipped.
        """
        if self._log_dir is None or self._snapshot_mode == "none":
            return None
        mode, gap = self._snapshot_mode, self._snapshot_gap
        if mode == "all":
            name = f"itr_{itr}.pkl"
        elif mode == "last":
            name = "params.pkl"
        elif mode == "gap":
            if itr % gap != 0:
                return None
            name = f"itr_{itr}.pkl"
        elif mode == "gap_and_last":
            if itr % gap == 0:
                self._write_snapshot(f"itr_{itr}.pkl", params)
            name = "params.pkl"
        else:  # pragma: no cover
            raise ValueError(mode)
        return self._write_snapshot(name, params)

    def _write_snapshot(self, name: str, params: Any) -> str:
        import jax

        host_params = jax.device_get(params)
        path = osp.join(self._log_dir, name)
        with open(path, "wb") as f:
            pickle.dump(host_params, f)
        return path

    def save_extra_data(self, data: Any, file_name: str) -> str:
        assert self._log_dir is not None
        path = osp.join(self._log_dir, file_name)
        if file_name.endswith(".json"):
            with open(path, "w") as f:
                json.dump(data, f, indent=2, default=repr)
        else:
            with open(path, "wb") as f:
                pickle.dump(data, f)
        return path

    def close(self) -> None:
        for f in (self._csv_file, self._text_file):
            if f is not None:
                f.close()
        self._csv_file = None
        self._csv_writer = None
        self._text_file = None


# Global singleton, matching the reference's module-level ``logger``
# (rlkit/core/logging.py:334).
logger = Logger()


def setup_logger(
    exp_name: str,
    variant: Optional[Mapping[str, Any]] = None,
    base_log_dir: str = "./logs",
    seed: int = 0,
    snapshot_mode: str = "gap_and_last",
    snapshot_gap: int = 10,
    unique_timestamp: bool = True,
    log: Optional[Logger] = None,
) -> str:
    """Create the run directory and configure the global logger.

    Mirrors rlkit/launchers/launcher_util.py:226-318 (log dir layout,
    variant.json) minus doodad/EC2 modes, which the shipped S2P scripts never
    use (mode="here_no_doodad", mujoco_finetune.py:408-418).
    """
    log = log or logger
    stamp = (
        datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
        if unique_timestamp
        else "run"
    )
    log_dir = osp.join(base_log_dir, exp_name, f"{exp_name}_{stamp}_s{seed}")
    log.set_log_dir(log_dir)
    log.set_snapshot_mode(snapshot_mode)
    log.set_snapshot_gap(snapshot_gap)
    if variant is not None:
        log.log_variant(variant)
        log.log(f"Variant:\n{Config(variant).to_json()}", with_timestamp=False)
    log.log(f"Logging to {log_dir}")
    return log_dir
