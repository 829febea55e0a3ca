#!/usr/bin/env python
"""S2P GAN training CLI (reference surface: README.md:56-60).

Thin wrapper over s2p_tpu.cli.train_gan — see that module for flags."""

from s2p_tpu.cli.train_gan import main

if __name__ == "__main__":
    main()
