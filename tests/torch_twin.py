"""PyTorch twin of the S2P generator — test-only.

Stands in for the (absent) reference GAN source: provides a torch
implementation with the same module naming as the flax tree so the
state_dict ↔ params converter and the numeric parity of every layer
(convs, instance norm, leaky-relu ordering, nearest upsample, tanh) can be
validated end-to-end without the released checkpoints (SURVEY §4 golden
tensor strategy). Image layout is NCHW on the torch side.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from s2p_tpu.gan.generator import resolution_chain


def pos_embed(x: torch.Tensor, num_freqs: int) -> torch.Tensor:
    freqs = torch.tensor([2.0**k for k in range(num_freqs)], dtype=x.dtype)
    xf = x[..., None] * freqs
    enc = torch.cat([torch.sin(xf), torch.cos(xf)], dim=-1)
    enc = enc.reshape(*x.shape[:-1], -1)
    return torch.cat([x, enc], dim=-1)


class MATNormTorch(nn.Module):
    def __init__(self, features: int, cond_ch: int, hidden: int):
        super().__init__()
        self.norm = nn.InstanceNorm2d(features, affine=False, eps=1e-5)
        self.mlp_shared = nn.Conv2d(cond_ch, hidden, 3, padding=1)
        self.mlp_gamma = nn.Conv2d(hidden, features, 3, padding=1)
        self.mlp_beta = nn.Conv2d(hidden, features, 3, padding=1)

    def forward(self, x, cond):
        h = F.relu(self.mlp_shared(cond))
        return self.norm(x) * (1 + self.mlp_gamma(h)) + self.mlp_beta(h)


class MATResBlockTorch(nn.Module):
    def __init__(self, c_in: int, c_out: int, cond_ch: int, hidden: int):
        super().__init__()
        fmid = min(c_in, c_out)
        self.norm_0 = MATNormTorch(c_in, cond_ch, hidden)
        self.conv_0 = nn.Conv2d(c_in, fmid, 3, padding=1)
        self.norm_1 = MATNormTorch(fmid, cond_ch, hidden)
        self.conv_1 = nn.Conv2d(fmid, c_out, 3, padding=1)
        self.learned_shortcut = c_in != c_out
        if self.learned_shortcut:
            self.norm_s = MATNormTorch(c_in, cond_ch, hidden)
            self.conv_s = nn.Conv2d(c_in, c_out, 1, bias=False)

    def forward(self, x, cond):
        h = self.conv_0(F.leaky_relu(self.norm_0(x, cond), 0.2))
        h = self.conv_1(F.leaky_relu(self.norm_1(h, cond), 0.2))
        s = self.conv_s(self.norm_s(x, cond)) if self.learned_shortcut else x
        return s + h


class ImageEncoderTorch(nn.Module):
    def __init__(self, in_ch: int, channels):
        super().__init__()
        c_prev = in_ch
        for i, c in enumerate(channels):
            stride = 1 if i == 0 else 2
            self.add_module(f"enc{i}", nn.Conv2d(c_prev, c, 3, stride=stride, padding=1))
            c_prev = c
        self.n = len(channels)

    def forward(self, img):
        feats = []
        h = img
        for i in range(self.n):
            h = F.leaky_relu(getattr(self, f"enc{i}")(h), 0.2)
            feats.append(h)
        return feats


class S2PGeneratorTorch(nn.Module):
    """Module names mirror the flax tree exactly (converter contract)."""

    def __init__(self, state_dim: int, image_size=64, ngf=64, state_freqs=6,
                 state_embed_dim=256, n_up=4, mat_hidden=128, out_channels=3):
        super().__init__()
        self.image_size, self.n_up, self.state_freqs = image_size, n_up, state_freqs
        self.sizes = resolution_chain(image_size, n_up)[::-1]
        ins = [8 * ngf, 8 * ngf, 4 * ngf, 2 * ngf, ngf][: n_up + 1]
        outs = [8 * ngf, 4 * ngf, 2 * ngf, ngf, ngf][: n_up + 1]
        enc_ch = [ngf, 2 * ngf, 4 * ngf, 8 * ngf, 8 * ngf][: n_up + 1]

        emb_in = state_dim * (2 * state_freqs + 1)
        self.state_fc0 = nn.Linear(emb_in, state_embed_dim)
        self.state_fc1 = nn.Linear(state_embed_dim, state_embed_dim)
        self.seed_fc = nn.Linear(state_embed_dim, self.sizes[0] ** 2 * ins[0])
        self.img_enc = ImageEncoderTorch(out_channels, enc_ch)
        # encoder emits full-res first; generator consumes seed-res first
        enc_by_level = enc_ch[::-1]
        for i, (ci, co) in enumerate(zip(ins, outs)):
            cond_ch = state_embed_dim + enc_by_level[i]
            self.add_module(f"block_{i}", MATResBlockTorch(ci, co, cond_ch, mat_hidden))
        self.conv_img = nn.Conv2d(outs[-1], out_channels, 3, padding=1)
        self._ins = ins

    def forward(self, state, prev_image):
        e = pos_embed(state, self.state_freqs)
        e = F.leaky_relu(self.state_fc0(e), 0.2)
        e = F.leaky_relu(self.state_fc1(e), 0.2)

        feats = self.img_enc(prev_image)
        enc_by_size = {f.shape[-1]: f for f in feats}

        hw0 = self.sizes[0]
        x = self.seed_fc(e)
        # flax reshape is (B, H, W, C); torch side works in NCHW, so build
        # HWC then permute to match element order
        x = x.reshape(-1, hw0, hw0, self._ins[0]).permute(0, 3, 1, 2)

        for i, size in enumerate(self.sizes):
            smap = e[:, :, None, None].expand(-1, -1, size, size)
            cond = torch.cat([smap, enc_by_size[size]], dim=1)
            x = getattr(self, f"block_{i}")(x, cond)
            if i < len(self.sizes) - 1:
                x = F.interpolate(x, size=self.sizes[i + 1], mode="nearest")
        x = self.conv_img(F.leaky_relu(x, 0.2))
        return torch.tanh(x)
