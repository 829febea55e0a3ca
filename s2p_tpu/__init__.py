"""s2p_tpu — TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of the S2P reference (dsshim0125/s2p, NeurIPS 2022).

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):

- ``s2p_tpu.utils``    — config tree, logger (progress.csv contract), timers,
                          seeding, orbax checkpointing, io.
- ``s2p_tpu.parallel`` — device-mesh bootstrap, sharding rules, collectives.
- ``s2p_tpu.nn``       — network library (MLP/CNN/initializers/distributions).
- ``s2p_tpu.ops``      — Pallas TPU kernels for the hot ops.
- ``s2p_tpu.models``   — S2P generator/discriminator, VGG, critics, policies.
- ``s2p_tpu.data``     — HDF5 datasets, device-resident replay buffers.
- ``s2p_tpu.gan``      — GAN losses, train step, eval metrics, converters.
- ``s2p_tpu.wm``       — Gaussian-ensemble world model + rollout generation.
- ``s2p_tpu.slac``     — SLAC sequential latent-variable model.
- ``s2p_tpu.rl``       — offline RL (IQL/CQL/SAC) trainers + algorithm loop.
- ``s2p_tpu.envs``     — env factory, wrappers, stubs for env-free testing.
"""

__version__ = "0.1.0"
