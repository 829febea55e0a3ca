#!/usr/bin/env python
"""Render S2P-generated next-frame images into an augment dataset,
producing the ``..._dataset-rl.hdf5`` the offline RL loop consumes
(SURVEY §1 data flow; reference consumer: rlkit/torch/slac/algo.py:179-210).

Thin wrapper over s2p_tpu.cli.generate_images — see that module for flags."""

from s2p_tpu.cli.generate_images import main

if __name__ == "__main__":
    main()
