"""RAD-style image augmentations, jit/vmap-native.

Capability contract (reference: examples/iql/data_augs.py:8-257 — the CURL/
RAD augmentation zoo used by the ``rad_aug`` path of the trainers):
random_crop, random_translate, grayscale, random_cutout(+color), flip,
rotation, random_convolution, color_jitter, no_aug.

TPU-first redesign: the reference mutates numpy per-image in Python loops;
here every op is a pure function over a **uint8/float NHWC batch** with an
explicit PRNG key, vectorized with vmap/dynamic_slice so it fuses into the
surrounding jitted train step. Grayscale/flip/rotation apply per-image with
probability p like the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(2,))
def random_crop(key: jax.Array, imgs: jax.Array, out: int = 84) -> jax.Array:
    """Random spatial crop per image (reference data_augs.py:8-24)."""
    B, H, W, C = imgs.shape
    k1, k2 = jax.random.split(key)
    h1 = jax.random.randint(k1, (B,), 0, H - out + 1)
    w1 = jax.random.randint(k2, (B,), 0, W - out + 1)

    def crop(img, h, w):
        return jax.lax.dynamic_slice(img, (h, w, 0), (out, out, C))

    return jax.vmap(crop)(imgs, h1, w1)


@partial(jax.jit, static_argnums=(2,))
def random_translate(key: jax.Array, imgs: jax.Array, size: int) -> jax.Array:
    """Place each image at a random offset on a zero canvas
    (reference data_augs.py:244-255)."""
    B, H, W, C = imgs.shape
    assert size >= H and size >= W
    k1, k2 = jax.random.split(key)
    h1 = jax.random.randint(k1, (B,), 0, size - H + 1)
    w1 = jax.random.randint(k2, (B,), 0, size - W + 1)

    def place(img, h, w):
        canvas = jnp.zeros((size, size, C), img.dtype)
        return jax.lax.dynamic_update_slice(canvas, img, (h, w, 0))

    return jax.vmap(place)(imgs, h1, w1)


_GRAY_W = jnp.asarray([0.2989, 0.587, 0.114])


def grayscale(imgs: jax.Array) -> jax.Array:
    """Luma grayscale replicated to 3 channels (reference :26-39)."""
    f = imgs.astype(jnp.float32)
    g = jnp.tensordot(f, _GRAY_W, axes=[[-1], [0]])[..., None]
    g = jnp.broadcast_to(g, f.shape)
    return g.astype(imgs.dtype)


@jax.jit
def random_grayscale(key: jax.Array, imgs: jax.Array, p: float = 0.3) -> jax.Array:
    B = imgs.shape[0]
    mask = jax.random.bernoulli(key, p, (B,))
    return jnp.where(mask[:, None, None, None], grayscale(imgs), imgs)


@partial(jax.jit, static_argnums=(2, 3))
def random_cutout(key: jax.Array, imgs: jax.Array, min_cut: int = 10,
                  max_cut: int = 30, color: Optional[jax.Array] = None) -> jax.Array:
    """Zero (or colored) box per image (reference :71-115)."""
    B, H, W, C = imgs.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sizes = jax.random.randint(k1, (B,), min_cut, max_cut)
    h0 = jax.random.randint(k2, (B,), 0, H - max_cut)
    w0 = jax.random.randint(k3, (B,), 0, W - max_cut)
    if color is None:
        fill = jnp.zeros((B, C), imgs.dtype)
    else:
        fill = jnp.broadcast_to(color, (B, C)).astype(imgs.dtype)
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    inside = (
        (rows >= h0[:, None, None]) & (rows < (h0 + sizes)[:, None, None])
        & (cols >= w0[:, None, None]) & (cols < (w0 + sizes)[:, None, None])
    )
    return jnp.where(inside[..., None], fill[:, None, None, :], imgs)


def random_cutout_color(key: jax.Array, imgs: jax.Array, min_cut: int = 10,
                        max_cut: int = 30) -> jax.Array:
    k1, k2 = jax.random.split(key)
    color = jax.random.randint(k1, (imgs.shape[0], imgs.shape[-1]), 0, 255)
    return random_cutout(k2, imgs, min_cut, max_cut, color=color)


@jax.jit
def random_flip(key: jax.Array, imgs: jax.Array, p: float = 0.2) -> jax.Array:
    """Horizontal flip with probability p per image (reference :117-148)."""
    mask = jax.random.bernoulli(key, p, (imgs.shape[0],))
    return jnp.where(mask[:, None, None, None], imgs[:, :, ::-1], imgs)


@jax.jit
def random_rotation(key: jax.Array, imgs: jax.Array, p: float = 0.3) -> jax.Array:
    """Rotate by a random multiple of 90° with probability p
    (reference :150-191)."""
    k1, k2 = jax.random.split(key)
    B = imgs.shape[0]
    mask = jax.random.bernoulli(k1, p, (B,))
    rot = jax.random.randint(k2, (B,), 1, 4)
    rots = jnp.stack([
        imgs,
        jnp.rot90(imgs, 1, axes=(1, 2)),
        jnp.rot90(imgs, 2, axes=(1, 2)),
        jnp.rot90(imgs, 3, axes=(1, 2)),
    ])
    sel = jnp.where(mask, rot, 0)
    return jnp.take_along_axis(
        rots, sel[None, :, None, None, None], axis=0
    ).squeeze(0)


@jax.jit
def random_convolution(key: jax.Array, imgs: jax.Array) -> jax.Array:
    """Per-image random 3×3 color-mixing conv (reference :193-224)."""
    B, H, W, C = imgs.shape
    f = imgs.astype(jnp.float32) / 255.0
    w = jax.random.uniform(key, (B, 3, 3, C, C), minval=-1.0, maxval=1.0)

    def conv(img, kernel):
        return jax.lax.conv_general_dilated(
            img[None], kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    out = jax.vmap(conv)(f, w)
    out = jnp.clip(jnp.abs(out), 0, 1.0)
    return (out * 255.0).astype(imgs.dtype)


@jax.jit
def random_color_jitter(key: jax.Array, imgs: jax.Array,
                        brightness: float = 0.4, contrast: float = 0.4) -> jax.Array:
    """Brightness/contrast jitter (reference :226-242 uses a torchvision
    ColorJitter; same observable effect class)."""
    B = imgs.shape[0]
    k1, k2 = jax.random.split(key)
    f = imgs.astype(jnp.float32) / 255.0
    b = jax.random.uniform(k1, (B, 1, 1, 1), minval=1 - brightness,
                           maxval=1 + brightness)
    c = jax.random.uniform(k2, (B, 1, 1, 1), minval=1 - contrast,
                           maxval=1 + contrast)
    mean = jnp.mean(f, axis=(1, 2, 3), keepdims=True)
    out = jnp.clip((f * b - mean) * c + mean, 0, 1)
    return (out * 255.0).astype(imgs.dtype)


def no_aug(key: jax.Array, imgs: jax.Array) -> jax.Array:
    del key
    return imgs


AUGMENTATIONS = {
    "crop": random_crop,
    "translate": random_translate,
    "grayscale": random_grayscale,
    "cutout": random_cutout,
    "cutout_color": random_cutout_color,
    "flip": random_flip,
    "rotation": random_rotation,
    "convolution": random_convolution,
    "color_jitter": random_color_jitter,
    "no_aug": no_aug,
}
