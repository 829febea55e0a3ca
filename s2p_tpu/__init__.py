"""s2p_tpu — TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of the S2P reference (dsshim0125/s2p, NeurIPS 2022).

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):

- ``s2p_tpu.utils``       — config tree, logger (progress.csv contract),
                             timers, seeding, orbax checkpointing, io,
                             launchers, sweepers, exploration, plotting,
                             profiling.
- ``s2p_tpu.parallel``    — device-mesh bootstrap, sharding rules.
- ``s2p_tpu.nn``          — network library (MLP/CNN/initializers/
                             distributions/mixtures/augmentations).
- ``s2p_tpu.gan``         — S2P generator (MAT/SAT), multiscale PatchGAN,
                             losses, train step, metrics, converters,
                             Pallas kernels, scan rollout.
- ``s2p_tpu.world_model`` — Gaussian-ensemble dynamics + augment rollout.
- ``s2p_tpu.slac``        — SLAC sequential latent-variable model.
- ``s2p_tpu.rl``          — IQL/CQL/SAC trainers, policies, critics,
                             encoders.
- ``s2p_tpu.core``        — batch/online/offline epoch loops, video,
                             trainer protocols.
- ``s2p_tpu.samplers``    — rollouts, path/step collectors, agents.
- ``s2p_tpu.envs``        — dm_control factory, wrappers, stacks,
                             multitask families, stubs.
- ``s2p_tpu.data``        — HDF5 schemas, replay buffers (device-resident
                             SLAC sequences, simple/env/HER/multitask),
                             pair datasets, path loaders.
- ``s2p_tpu.testing``     — csv regression, stubs, golden-tensor traces.
- ``s2p_tpu.cli``         — train/simple_test/finetune/generate entries.
"""

__version__ = "0.1.0"
