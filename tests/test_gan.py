"""S2P GAN tests: shapes, zero-masking semantics, rollout, losses, training.

Mirrors the reference's validation strategy (SURVEY §4): stub-data unit
tests, deterministic seeded checks, and behavior contracts from
rebuttal.md (zero state → modulation pathway dead, etc.)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2p_tpu.gan import (
    GANTrainer,
    MultiscaleDiscriminator,
    PositionalEmbedding,
    S2PGenerator,
    generate_rollout,
    resolution_chain,
)
from s2p_tpu.gan.discriminator import avg_pool_2x
from s2p_tpu.gan.losses import (
    feature_matching_loss,
    hinge_d_loss,
    hinge_g_loss,
)
from s2p_tpu.gan.perceptual import PerceptualLoss, VGG19Features, load_torch_vgg19

STATE_DIM = 17


def _gen_and_params(image_size=64, **kw):
    gen = S2PGenerator(image_size=image_size, **kw)
    s = jnp.zeros((2, STATE_DIM))
    img = jnp.zeros((2, image_size, image_size, 3))
    params = gen.init(jax.random.PRNGKey(0), s, img)
    return gen, params


def test_resolution_chain():
    assert resolution_chain(64, 4) == [64, 32, 16, 8, 4]
    assert resolution_chain(100, 4) == [100, 50, 25, 13, 7]


def test_positional_embedding_shape_and_values():
    pe = PositionalEmbedding(num_freqs=4)
    x = jnp.ones((3, 5))
    y = pe.apply({}, x)
    assert y.shape == (3, 5 * (2 * 4 + 1))
    # first block is the input itself
    np.testing.assert_allclose(np.asarray(y[:, :5]), np.ones((3, 5)), atol=1e-6)


@pytest.mark.parametrize("size", [64, 100])
@pytest.mark.slow
def test_generator_output_shape(size):
    gen, params = _gen_and_params(image_size=size, ngf=16, state_embed_dim=32,
                                  mat_hidden=32)
    s = jax.random.normal(jax.random.PRNGKey(1), (2, STATE_DIM))
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, size, size, 3), minval=-1)
    out = gen.apply(params, s, img)
    assert out.shape == (2, size, size, 3)
    assert jnp.all(jnp.abs(out) <= 1.0)


@pytest.mark.slow
def test_generator_is_deterministic():
    gen, params = _gen_and_params(ngf=16, state_embed_dim=32, mat_hidden=32)
    s = jax.random.normal(jax.random.PRNGKey(1), (2, STATE_DIM))
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3), minval=-1)
    a = gen.apply(params, s, img)
    b = gen.apply(params, s, img)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_generator_modality_sensitivity():
    """Both modalities must influence the output (MAT contract,
    rebuttal.md:145-156): changing either the state or the previous image
    changes the generated frame."""
    gen, params = _gen_and_params(ngf=16, state_embed_dim=32, mat_hidden=32)
    s = jax.random.normal(jax.random.PRNGKey(1), (1, STATE_DIM))
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3), minval=-1)
    base = gen.apply(params, s, img)
    by_state = gen.apply(params, s + 1.0, img)
    by_image = gen.apply(params, s, jnp.roll(img, 7, axis=1))
    assert float(jnp.max(jnp.abs(base - by_state))) > 1e-4
    assert float(jnp.max(jnp.abs(base - by_image))) > 1e-4


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["sat_state", "sat_image"])
def test_sat_ablation_modes(mode):
    """SAT single-modality ablation (rebuttal.md:170-175) runs and, for
    sat_state, the previous image cannot modulate the norm layers."""
    gen, params = _gen_and_params(ngf=8, state_embed_dim=16, mat_hidden=16,
                                  mat_mode=mode)
    s = jax.random.normal(jax.random.PRNGKey(1), (1, STATE_DIM))
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3), minval=-1)
    out = gen.apply(params, s, img)
    assert out.shape == (1, 64, 64, 3)


@pytest.mark.slow
def test_rollout_scan_matches_python_loop():
    gen, params = _gen_and_params(ngf=8, state_embed_dim=16, mat_hidden=16)
    T, B = 3, 2
    states = jax.random.normal(jax.random.PRNGKey(3), (T, B, STATE_DIM))
    init = jax.random.uniform(jax.random.PRNGKey(4), (B, 64, 64, 3), minval=-1)
    frames = generate_rollout(gen, params, init, states)
    assert frames.shape == (T, B, 64, 64, 3)
    prev = init
    for t in range(T):
        prev = gen.apply(params, states[t], prev)
        np.testing.assert_allclose(
            np.asarray(frames[t]), np.asarray(prev), atol=1e-5
        )


@pytest.mark.slow
def test_discriminator_shapes_and_scales():
    disc = MultiscaleDiscriminator(num_scales=2, ndf=16, n_layers=3)
    s = jnp.zeros((2, STATE_DIM))
    img = jnp.zeros((2, 64, 64, 3))
    params = disc.init(jax.random.PRNGKey(0), s, img, img)
    outs = disc.apply(params, s, img, img)
    assert len(outs) == 2
    # each scale: n_layers feature maps + 1 logit map
    assert all(len(o) == 4 for o in outs)
    assert outs[0][-1].shape[-1] == 1
    # second scale sees a 2x pooled input → smaller maps
    assert outs[1][-1].shape[1] < outs[0][-1].shape[1]


def test_avg_pool_2x_matches_torch_count_include_pad_false():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(1, 7, 7, 2).astype(np.float32)
    ours = np.asarray(avg_pool_2x(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.avg_pool2d(
        xt, 3, stride=2, padding=1, count_include_pad=False
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_hinge_losses():
    r = [jnp.full((1, 4, 4, 1), 2.0)]
    f = [jnp.full((1, 4, 4, 1), -2.0)]
    assert float(hinge_d_loss(r, f)) == 0.0  # well-separated → zero loss
    assert float(hinge_g_loss(f)) == 2.0
    # misclassified real costs
    assert float(hinge_d_loss(f, f)) == pytest.approx(3.0)


def test_feature_matching_identical_is_zero():
    feats = [[jnp.ones((1, 4, 4, 8)), jnp.ones((1, 2, 2, 16)), jnp.zeros((1, 2, 2, 1))]]
    assert float(feature_matching_loss(feats, feats)) == 0.0


@pytest.mark.slow
def test_vgg19_feature_pyramid():
    mod = VGG19Features()
    x = jnp.zeros((1, 64, 64, 3))
    variables = mod.init(jax.random.PRNGKey(0), x)
    feats = mod.apply(variables, x)
    assert [f.shape[1] for f in feats] == [64, 32, 16, 8, 4]
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]


def test_vgg19_torch_weight_conversion_parity():
    torch = pytest.importorskip("torch")
    # build a tiny fake torchvision-style state dict with random weights
    rs = np.random.RandomState(0)
    sd = {}
    from s2p_tpu.gan.perceptual import _VGG19_CHANNELS

    c_in = 3
    for li in sorted(_VGG19_CHANNELS):
        c_out = _VGG19_CHANNELS[li]
        sd[f"features.{li}.weight"] = torch.from_numpy(
            rs.randn(c_out, c_in, 3, 3).astype(np.float32) * 0.05
        )
        sd[f"features.{li}.bias"] = torch.from_numpy(
            rs.randn(c_out).astype(np.float32) * 0.05
        )
        c_in = c_out
    variables = load_torch_vgg19(sd)
    x = jnp.asarray(rs.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
    feats = VGG19Features().apply(variables, x)

    # torch twin
    layers = []
    idx2layer = {}
    for li in sorted(_VGG19_CHANNELS):
        conv = torch.nn.Conv2d(sd[f"features.{li}.weight"].shape[1],
                               sd[f"features.{li}.weight"].shape[0], 3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(sd[f"features.{li}.weight"])
            conv.bias.copy_(sd[f"features.{li}.bias"])
        idx2layer[li] = conv
    from s2p_tpu.gan.perceptual import _IMAGENET_MEAN, _IMAGENET_STD, _POOL_BEFORE, _VGG19_SLICES

    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
    xt = ((xt + 1) * 0.5 - torch.tensor(_IMAGENET_MEAN)[None, :, None, None]) / \
        torch.tensor(_IMAGENET_STD)[None, :, None, None]
    h = xt
    torch_feats = []
    with torch.no_grad():
        for group in _VGG19_SLICES:
            for li in group:
                if _POOL_BEFORE.get(li):
                    h = torch.nn.functional.max_pool2d(h, 2, 2)
                h = torch.relu(idx2layer[li](h))
            torch_feats.append(h.numpy().transpose(0, 2, 3, 1))
    for ours, ref in zip(feats, torch_feats):
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


def test_perceptual_loss_zero_on_identical():
    pl = PerceptualLoss(image_shape=(32, 32, 3))
    x = jnp.zeros((1, 32, 32, 3))
    assert float(pl(x, x)) == 0.0


@pytest.mark.slow
def test_gan_trainer_step_improves_l1():
    """A few steps on one constant batch must reduce the reconstruction
    terms — sanity that gradients flow through both towers."""
    rs = np.random.RandomState(0)
    batch = dict(
        prev_image=rs.randint(0, 255, (4, 64, 64, 3), dtype=np.uint8),
        state=rs.randn(4, STATE_DIM).astype(np.float32),
        target_image=rs.randint(0, 255, (4, 64, 64, 3), dtype=np.uint8),
    )
    trainer = GANTrainer.create(
        jax.random.PRNGKey(0), state_dim=STATE_DIM, image_size=64,
        generator_kwargs=dict(ngf=8, state_embed_dim=16, mat_hidden=16,
                              state_freqs=2),
        discriminator_kwargs=dict(num_scales=1, ndf=8, n_layers=2),
        use_perceptual=False,
    )
    first = trainer.train_step(batch)
    for _ in range(10):
        last = trainer.train_step(batch)
    assert float(last["g_l1"]) < float(first["g_l1"])
    assert np.isfinite(float(last["d_loss"]))


@pytest.mark.slow
def test_gan_trainer_bf16_compute():
    """Mixed precision: bf16 forwards, fp32 params/grads stay finite and
    reconstruction still improves."""
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    batch = dict(
        prev_image=rs.randint(0, 255, (4, 64, 64, 3), dtype=np.uint8),
        state=rs.randn(4, STATE_DIM).astype(np.float32),
        target_image=rs.randint(0, 255, (4, 64, 64, 3), dtype=np.uint8),
    )
    trainer = GANTrainer.create(
        jax.random.PRNGKey(0), state_dim=STATE_DIM, image_size=64,
        generator_kwargs=dict(ngf=8, state_embed_dim=16, mat_hidden=16,
                              state_freqs=2),
        discriminator_kwargs=dict(num_scales=1, ndf=8, n_layers=2),
        use_perceptual=False, compute_dtype=jnp.bfloat16,
    )
    first = trainer.train_step(batch)
    for _ in range(10):
        last = trainer.train_step(batch)
    assert float(last["g_l1"]) < float(first["g_l1"])
    # params remain fp32
    leaf = jax.tree_util.tree_leaves(trainer.g_state.params)[0]
    assert leaf.dtype == jnp.float32


def test_pair_dataset_multi_env_concat(tmp_path):
    from s2p_tpu.data.hdf5 import make_synthetic_rl_dataset, save_dataset
    from s2p_tpu.data.pair_dataset import S2PPairDataset

    a = make_synthetic_rl_dataset(n_episodes=1, episode_len=8, obs_dim=17,
                                  act_dim=6, img_hw=16, seed=0)
    b = make_synthetic_rl_dataset(n_episodes=1, episode_len=8, obs_dim=24,
                                  act_dim=6, img_hw=16, seed=1)
    pa, pb = str(tmp_path / "cheetah.hdf5"), str(tmp_path / "walker.hdf5")
    save_dataset(pa, a)
    save_dataset(pb, b)
    ds = S2PPairDataset.from_hdf5(f"{pa},{pb}")
    assert ds.state_dim == 24  # padded to the widest env
    assert len(ds) == 16  # tp1 pairing keeps all 8 rows per episode
    # env ids follow the dataroot order so eval can split per env
    assert ds.n_envs == 2
    assert (ds.env_ids == np.repeat([0, 1], 8)).all()
    sub = ds.env_subset(1, n=4)
    assert len(sub) == 4 and sub.n_envs == 2  # ids preserved
    assert (sub.states == ds.states[8:12]).all()


def test_multi_env_eval_reports_per_env_columns(tmp_path):
    """Multi-env eval must not silently measure only the first dataroot:
    per-env psnr/ssim columns are emitted and the pooled metric covers the
    union of per-env slices (VERDICT r3 next-#6 done-criterion)."""
    from s2p_tpu.cli.train_gan import evaluate_generator
    from s2p_tpu.data.hdf5 import make_synthetic_rl_dataset, save_dataset
    from s2p_tpu.data.pair_dataset import S2PPairDataset

    a = make_synthetic_rl_dataset(n_episodes=1, episode_len=8, obs_dim=17,
                                  act_dim=6, img_hw=16, seed=0)
    b = make_synthetic_rl_dataset(n_episodes=1, episode_len=8, obs_dim=24,
                                  act_dim=6, img_hw=16, seed=1)
    pa, pb = str(tmp_path / "a.hdf5"), str(tmp_path / "b.hdf5")
    save_dataset(pa, a)
    save_dataset(pb, b)
    ds = S2PPairDataset.from_hdf5(f"{pa},{pb}")

    class IdentityTrainer:
        # "generator" that returns the previous frame — deterministic,
        # env-dependent quality (psnr of i_t vs i_{t+1} differs per env)
        def generate(self, state, prev):
            return prev

    out = evaluate_generator(IdentityTrainer(), ds, n=8)
    for k in ("psnr", "ssim", "psnr_env0", "psnr_env1",
              "ssim_env0", "ssim_env1"):
        assert k in out and np.isfinite(out[k]), (k, out)
    # pooled != first-env-only (the old head-slice behavior) unless the
    # two envs happen to tie — these seeds don't
    assert abs(out["psnr"] - out["psnr_env0"]) > 1e-6
    # pooled psnr must lie between the per-env values
    lo = min(out["psnr_env0"], out["psnr_env1"])
    hi = max(out["psnr_env0"], out["psnr_env1"])
    assert lo - 1e-6 <= out["psnr"] <= hi + 1e-6


@pytest.mark.slow
def test_gan_trainer_scanned_many_matches_per_step_scale():
    """train_many folds K D+G updates into one lax.scan dispatch with
    on-device uniform sampling; states advance by K steps and the chunk-mean
    metrics are finite (the scanned-path analog of the RL train_many)."""
    rs = np.random.RandomState(1)
    data = dict(
        prev_image=rs.randint(0, 255, (12, 64, 64, 3), dtype=np.uint8),
        state=rs.randn(12, STATE_DIM).astype(np.float32),
        target_image=rs.randint(0, 255, (12, 64, 64, 3), dtype=np.uint8),
    )
    trainer = GANTrainer.create(
        jax.random.PRNGKey(0), state_dim=STATE_DIM, image_size=64,
        generator_kwargs=dict(ngf=8, state_embed_dim=16, mat_hidden=16,
                              state_freqs=2),
        discriminator_kwargs=dict(num_scales=1, ndf=8, n_layers=2),
        use_perceptual=False,
    )
    assert int(trainer.g_state.step) == 0
    import jax.numpy as jnp

    device_data = {k: jnp.asarray(v) for k, v in data.items()}
    metrics = trainer.train_many(device_data, jax.random.PRNGKey(7),
                                 num_steps=5, batch_size=4)
    assert int(trainer.g_state.step) == 5
    assert int(trainer.d_state.step) == 5
    for v in jax.device_get(metrics).values():
        assert np.isfinite(float(v))
    # a second chunk keeps advancing from the carried states
    trainer.train_many(device_data, jax.random.PRNGKey(8),
                       num_steps=3, batch_size=4)
    assert int(trainer.g_state.step) == 8


@pytest.mark.slow
def test_gan_trainer_r1_and_d_cadence():
    """R1 penalty (lazy, StyleGAN2 scaling) and adaptive D cadence: the
    d_r1 metric is positive exactly on lazy steps, D's step counter only
    advances on its cadence, and training stays finite."""
    from s2p_tpu.gan.losses import GANLossConfig

    rs = np.random.RandomState(2)
    batch = dict(
        prev_image=rs.randint(0, 255, (4, 64, 64, 3), dtype=np.uint8),
        state=rs.randn(4, STATE_DIM).astype(np.float32),
        target_image=rs.randint(0, 255, (4, 64, 64, 3), dtype=np.uint8),
    )
    trainer = GANTrainer.create(
        jax.random.PRNGKey(0), state_dim=STATE_DIM, image_size=64,
        generator_kwargs=dict(ngf=8, state_embed_dim=16, mat_hidden=16,
                              state_freqs=2),
        discriminator_kwargs=dict(num_scales=1, ndf=8, n_layers=2),
        use_perceptual=False,
        loss_cfg=GANLossConfig(r1_gamma=1.0, r1_interval=2),
        d_every=2,
    )
    r1s, d_steps = [], []
    for _ in range(8):
        m = trainer.train_step(batch)
        r1s.append(float(m["d_r1"]))
        d_steps.append(int(trainer.d_state.step))
        assert np.isfinite(float(m["d_loss"]))
        assert np.isfinite(float(m["g_loss"]))
    # D updates on g-steps 0,2,4,6 (d_every 2); the lazy-R1 schedule keys
    # off the D step counter, so R1 fires every 2nd PERFORMED D update
    # (g-steps 0 and 4) — not on every D update, and never on G-only steps
    assert r1s[0] > 0.0 and r1s[4] > 0.0
    assert all(r1s[i] == 0.0 for i in (1, 2, 3, 5, 6, 7))
    assert d_steps == [1, 1, 2, 2, 3, 3, 4, 4]
    assert int(trainer.g_state.step) == 8


@pytest.mark.slow
def test_gan_trainer_r1_misaligned_cadence():
    """d_every=2 with r1_interval=3 (2 does not divide 3): R1 must still
    fire every 3rd performed D update at full strength, not every
    lcm(3,2)=6 G-steps (the bug keying the schedule off g_state.step)."""
    from s2p_tpu.gan.losses import GANLossConfig

    rs = np.random.RandomState(3)
    batch = dict(
        prev_image=rs.randint(0, 255, (4, 64, 64, 3), dtype=np.uint8),
        state=rs.randn(4, STATE_DIM).astype(np.float32),
        target_image=rs.randint(0, 255, (4, 64, 64, 3), dtype=np.uint8),
    )
    trainer = GANTrainer.create(
        jax.random.PRNGKey(0), state_dim=STATE_DIM, image_size=64,
        generator_kwargs=dict(ngf=8, state_embed_dim=16, mat_hidden=16,
                              state_freqs=2),
        discriminator_kwargs=dict(num_scales=1, ndf=8, n_layers=2),
        use_perceptual=False,
        loss_cfg=GANLossConfig(r1_gamma=1.0, r1_interval=3),
        d_every=2,
    )
    r1s = []
    for _ in range(14):
        m = trainer.train_step(batch)
        r1s.append(float(m["d_r1"]))
    # D updates at g-steps 0,2,4,...; R1 on d-steps 0,3,6 → g-steps 0,6,12
    fired = [i for i, v in enumerate(r1s) if v > 0.0]
    assert fired == [0, 6, 12]
