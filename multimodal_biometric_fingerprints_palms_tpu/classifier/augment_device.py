"""On-device contrastive augmentations for SSL training.

TPU-native replacement for the host cv2 augmentation path
(reference classifier/dataset2/dataset.py:13-59, rebuilt host-side in
``classifier.data.FingerprintAugmentations``). The host path re-renders and
re-ships two f32 views of every image every epoch — at 224x224 that is
~800 MB/epoch of host->device traffic for a 2048-image dataset, which
dominated the round-3 at-scale run (~730 s/epoch through the axon relay).

Here the raw uint8 dataset is shipped ONCE and stays device-resident; each
train step samples a batch and renders both views inside the jit program:

- rotation (p=0.8 uniform +-15 deg, else a 90-degree multiple), flips
  (lr p=0.5, ud p=0.3), random crop scale 0.8-1.0 and resize to
  ``image_size`` are composed into ONE affine source-coordinate map per
  image, sampled bilinearly with reflect-101 border folding (one fused
  4-tap gather instead of three cv2 passes);
- brightness/contrast jitter (p=0.5) and gaussian noise (p=0.5,
  sigma 0.015) run elementwise on the sampled views.

Randomness is jax.random (fold_in per image), so augmentation is
deterministic given the step rng — no host RNG state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _reflect101(coord: jnp.ndarray, n: int) -> jnp.ndarray:
    """Fold float coordinates into [0, n-1] with cv2 BORDER_REFLECT_101
    semantics (mirror about the edge pixels, edge not repeated)."""
    period = 2.0 * (n - 1)
    c = jnp.mod(coord, period)
    return jnp.where(c > (n - 1), period - c, c)


def _augment_one(img: jnp.ndarray, rng: jax.Array, image_size: int
                 ) -> jnp.ndarray:
    """One augmented (image_size, image_size) f32 view of one (H, W) f32
    image in [0, 1]."""
    h, w = img.shape
    r_ang, r_mode, r_ninety, r_lr, r_ud, r_scale, r_ox, r_oy, r_bc, \
        r_alpha, r_beta, r_donoise, r_noise = jax.random.split(rng, 13)

    # rotation angle: p=0.8 uniform(-15, 15) deg, else 90-degree multiple
    ang_small = jax.random.uniform(r_ang, (), minval=-15.0, maxval=15.0)
    ang_ninety = 90.0 * jax.random.randint(r_ninety, (), 0, 4)
    use_small = jax.random.uniform(r_mode, ()) < 0.8
    theta = jnp.deg2rad(jnp.where(use_small, ang_small, ang_ninety))

    flip_lr = jax.random.uniform(r_lr, ()) < 0.5
    flip_ud = jax.random.uniform(r_ud, ()) < 0.3

    # crop window on the (rotated, flipped) full frame
    scale = jax.random.uniform(r_scale, (), minval=0.8, maxval=1.0)
    crop = scale * min(h, w)
    ox = jax.random.uniform(r_ox, ()) * (w - crop)
    oy = jax.random.uniform(r_oy, ()) * (h - crop)

    # output grid -> crop coords -> flip -> inverse rotation about center
    ii = jnp.arange(image_size, dtype=jnp.float32)
    step = crop / float(image_size)
    gy = oy + (ii[:, None] + 0.5) * step - 0.5
    gx = ox + (ii[None, :] + 0.5) * step - 0.5
    gy = jnp.broadcast_to(gy, (image_size, image_size))
    gx = jnp.broadcast_to(gx, (image_size, image_size))
    gx = jnp.where(flip_lr, (w - 1) - gx, gx)
    gy = jnp.where(flip_ud, (h - 1) - gy, gy)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # cv2.getRotationMatrix2D maps src->dst; sample dst with the inverse
    sx = cos * (gx - cx) - sin * (gy - cy) + cx
    sy = sin * (gx - cx) + cos * (gy - cy) + cy

    sx = _reflect101(sx, w)
    sy = _reflect101(sy, h)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, h - 2).astype(jnp.int32)

    flat = img.reshape(-1)
    base = y0i * w + x0i
    v00 = jnp.take(flat, base.reshape(-1)).reshape(base.shape)
    v01 = jnp.take(flat, (base + 1).reshape(-1)).reshape(base.shape)
    v10 = jnp.take(flat, (base + w).reshape(-1)).reshape(base.shape)
    v11 = jnp.take(flat, (base + w + 1).reshape(-1)).reshape(base.shape)
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)

    # brightness/contrast jitter (p=0.5)
    alpha = jax.random.uniform(r_alpha, (), minval=0.8, maxval=1.2)
    beta = jax.random.uniform(r_beta, (), minval=-0.1, maxval=0.1)
    do_bc = jax.random.uniform(r_bc, ()) < 0.5
    out = jnp.where(do_bc, jnp.clip(alpha * out + beta, 0.0, 1.0), out)

    # gaussian noise (p=0.5)
    noise = 0.015 * jax.random.normal(r_noise, out.shape)
    do_noise = jax.random.uniform(r_donoise, ()) < 0.5
    return jnp.where(do_noise, jnp.clip(out + noise, 0.0, 1.0), out)


def augment_batch(imgs: jnp.ndarray, rng: jax.Array, image_size: int = 224
                  ) -> jnp.ndarray:
    """(B, H, W) f32 [0,1] -> (B, image_size, image_size) augmented views.

    Jit-friendly: static shapes, one fused gather pass, per-image rngs via
    fold_in. Call twice with different rngs for a two-view SSL batch.
    """
    b = imgs.shape[0]
    rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(b))
    return jax.vmap(_augment_one, in_axes=(0, 0, None))(imgs, rngs,
                                                        image_size)
