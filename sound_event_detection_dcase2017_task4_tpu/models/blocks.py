"""Shared model building blocks (flax linen, NHWC, bf16-capable).

TPU-native re-design of the reference's conv building blocks
(reference: ``pytorch/models.py:{init_layer,init_bn,ConvBlock,AttBlock}`` and
the GLU block of the gated-CNN variant; SURVEY.md §2 "Conv building blocks",
"Attention pooling head", "Gated-CNN (GLU) model").

Design notes vs the reference:
* NHWC ``[B, T, F, C]`` layout (torch reference is NCHW) — NHWC is the
  layout XLA:TPU convolutions natively tile onto the MXU.
* ``dtype`` threads a mixed-precision compute type (bf16 on TPU) while
  parameters stay f32 (``param_dtype``); the reference is f32-only.
* Xavier/Glorot-uniform init mirrors the reference's ``init_layer``;
  BatchNorm starts at scale 1 / bias 0 like ``init_bn``.
"""

from __future__ import annotations



import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ConvBlock", "GLUBlock", "AttBlock", "interpolate",
           "pad_framewise_output", "frames_after_pooling"]

_glorot = nn.initializers.glorot_uniform()


class ConvBlock(nn.Module):
    """2 × (3×3 conv → BN → ReLU) → 2×2 average pool.

    Mirrors reference ``pytorch/models.py:ConvBlock`` (reconstructed).
    ``pool`` can be disabled for the last block of deeper stacks.
    """

    channels: int
    pool: tuple[int, int] = (2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for _ in range(2):
            x = nn.Conv(
                self.channels, (3, 3), padding="SAME", use_bias=False,
                kernel_init=_glorot, dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        if self.pool != (1, 1):
            x = nn.avg_pool(x, self.pool, strides=self.pool)
        return x


class GLUBlock(nn.Module):
    """Gated linear unit conv block: ``conv(x) * sigmoid(gate(x))``.

    The gated-CNN variant à la Xu et al. 2017 (arXiv:1710.00343, the DCASE2017
    winner cited by the reference; SURVEY.md §2 "Gated-CNN (GLU) model").
    One 3×3 conv produces 2×channels; the second half gates the first —
    a single fused matmul on the MXU instead of two convs.
    """

    channels: int
    pool: tuple[int, int] = (2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for _ in range(2):
            h = nn.Conv(
                2 * self.channels, (3, 3), padding="SAME", use_bias=False,
                kernel_init=_glorot, dtype=self.dtype,
            )(x)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
            )(h)
            lin, gate = jnp.split(h, 2, axis=-1)
            x = lin * nn.sigmoid(gate)
        if self.pool != (1, 1):
            x = nn.avg_pool(x, self.pool, strides=self.pool)
        return x


class AttBlock(nn.Module):
    """Attention pooling over time for weak labels (MIL framing).

    Mirrors reference ``pytorch/models.py:AttBlock`` (PANNs-style,
    reconstructed; BASELINE.json: "attention pooling over time for weak
    labels"): per-frame classification branch ``cla`` (sigmoid) and gating
    branch normalized over time; ``clipwise = Σ_t norm_att · cla``.

    Input ``[B, T, D]`` → ``(clipwise [B, C], framewise [B, T, C])``.
    """

    classes_num: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        att = nn.Dense(self.classes_num, kernel_init=_glorot,
                       dtype=self.dtype)(x)                   # [B, T, C]
        att = jnp.clip(att, -10.0, 10.0)
        norm_att = nn.softmax(att.astype(jnp.float32), axis=1)  # over time
        cla = nn.sigmoid(
            nn.Dense(self.classes_num, kernel_init=_glorot,
                     dtype=self.dtype)(x).astype(jnp.float32))
        clipwise = jnp.sum(norm_att * cla, axis=1)            # [B, C]
        return clipwise, cla


def interpolate(x: jnp.ndarray, ratio: int) -> jnp.ndarray:
    """Repeat each frame ``ratio`` times along time: ``[B,T,C] → [B,T*ratio,C]``.

    Mirrors reference ``pytorch/pytorch_utils.py:interpolate`` (nearest-
    neighbour upsampling of framewise outputs back to input frame rate).
    """
    return jnp.repeat(x, ratio, axis=1)


def pad_framewise_output(x: jnp.ndarray, frames_num: int) -> jnp.ndarray:
    """Pad/truncate time axis to ``frames_num`` by repeating the last frame.

    Mirrors reference ``pytorch/pytorch_utils.py:pad_framewise_output``.
    """
    t = x.shape[1]
    if t >= frames_num:
        return x[:, :frames_num]
    pad = jnp.repeat(x[:, -1:], frames_num - t, axis=1)
    return jnp.concatenate([x, pad], axis=1)


def frames_after_pooling(frames: int, n_blocks: int, time_pool: int = 2) -> int:
    """Time length after ``n_blocks`` non-padded pool-by-``time_pool`` stages
    (floor division per stage, matching torch AvgPool2d semantics)."""
    for _ in range(n_blocks):
        frames = frames // time_pool
    return frames
