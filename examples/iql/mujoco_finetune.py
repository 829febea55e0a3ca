#!/usr/bin/env python
"""Offline image-RL entry point (reference surface:
examples/iql/mujoco_finetune.py). Thin wrapper over
s2p_tpu.cli.mujoco_finetune — see that module for flags."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from s2p_tpu.cli.mujoco_finetune import main

if __name__ == "__main__":
    main()
