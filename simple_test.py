#!/usr/bin/env python
"""S2P N-step generation CLI (reference surface: README.md:27-34).

Thin wrapper over s2p_tpu.cli.simple_test — see that module for flags."""

from s2p_tpu.cli.simple_test import main

if __name__ == "__main__":
    main()
