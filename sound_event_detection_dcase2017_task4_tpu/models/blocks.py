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


import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ConvBlock", "GLUBlock", "AttBlock", "BatchNorm", "Dropout",
           "avg_pool_2d", "interpolate", "pad_framewise_output",
           "frames_after_pooling"]

_glorot = nn.initializers.glorot_uniform()


class Dropout(nn.Module):
    """Dropout with 16-bit mask bits (TPU bandwidth optimization).

    Same regularizer as ``flax.linen.Dropout`` but the keep mask compares
    16-bit random integers instead of ``jax.random.bernoulli``'s 32-bit
    draw — on the bench config the u32 mask tensors are ~1 GB/step of pure
    HBM writes (rng-bit-generator ops in the device trace), and halving
    them is worth ~0.6 ms/step. The keep probability is quantized to
    1/65536 (e.g. 0.8 → 52429/65536 = 0.8000031); the inverse-scale uses
    the *quantized* probability so E[dropout(x)] == x exactly in f32.
    (In bf16 the division ``x / keep`` rounds ``keep`` to bf16 first —
    the same systematic rounding ``flax.linen.Dropout`` has; not worth an
    extra f32 upcast in the hot path.)
    """

    rate: float
    deterministic: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool | None = None) -> jnp.ndarray:
        det = self.deterministic if deterministic is None else deterministic
        if det or self.rate == 0.0:
            return x
        threshold = int(round((1.0 - self.rate) * 65536))
        assert 0 <= threshold <= 65536, self.rate
        if threshold == 65536:
            return x
        if threshold == 0:                     # rate ≈ 1.0: drop everything
            return jnp.zeros_like(x)           # (flax.linen.Dropout parity)
        keep = threshold / 65536.0
        bits = jax.random.bits(self.make_rng("dropout"), x.shape, jnp.uint16)
        mask = bits < jnp.uint16(threshold)
        return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                         jnp.zeros((), x.dtype))


class BatchNorm(nn.Module):
    """BatchNorm tuned for bf16 activations on TPU.

    Same math and variable layout as ``flax.linen.BatchNorm`` (params
    ``scale``/``bias``, batch_stats ``mean``/``var``, biased batch variance,
    EMA running stats), re-expressed so XLA never materializes an f32 copy
    of the activation (round-1 profiling attributed ~35 ms of the 97 ms
    train step to BN statistic reductions + bf16↔f32 converts;
    flax's ``_compute_stats`` upcasts the whole tensor):

    * batch statistics are two reductions with **f32 accumulators read
      directly from the bf16 activation** (the elementwise convert+square
      fuses into the reduce, single HBM pass for both via multi-output
      fusion);
    * normalization is folded to per-channel ``y = x * a + b`` with
      ``a = scale/sqrt(var+eps)``, ``b = bias − mean·a`` computed in f32 on
      ``[C]``-shaped vectors only — one bf16 FMA over the activation that
      XLA fuses into the adjacent conv/ReLU.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axes, dtype=jnp.float32)
            mean2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var

        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return x * a.astype(self.dtype) + b.astype(self.dtype)


def avg_pool_2d(x: jnp.ndarray, pool: tuple[int, int]) -> jnp.ndarray:
    """Non-overlapping 2-D average pool on ``[B, T, F, C]``.

    Kept on ``nn.avg_pool`` (``reduce_window``): an A/B on the v5e chip
    showed the tempting reshape+mean form is 33% SLOWER end-to-end
    (129.7 vs 97.6 ms/step, bench config) — the [B,T/2,2,F/2,2,C] reshape
    forces relayouts that cost far more than reduce_window's backward.
    """
    return nn.avg_pool(x, pool, strides=pool)


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
        for i in range(2):
            x = nn.Conv(
                self.channels, (3, 3), padding="SAME", use_bias=False,
                kernel_init=_glorot, dtype=self.dtype,
            )(x)
            # explicit name keeps the flax-nn.BatchNorm checkpoint layout
            x = BatchNorm(
                use_running_average=not train, momentum=0.9,
                dtype=self.dtype, name=f"BatchNorm_{i}",
            )(x)
            x = nn.relu(x)
        if self.pool != (1, 1):
            x = avg_pool_2d(x, self.pool)
        return x


class GLUBlock(nn.Module):
    """Gated linear unit conv block: ``conv(x) * sigmoid(gate(x))``.

    The gated-CNN variant à la Xu et al. 2017 (arXiv:1710.00343, the DCASE2017
    winner cited by the reference; SURVEY.md §2 "Gated-CNN (GLU) model").

    Layout note (round-3 A/B on v5e, batch-128 bench config): the tempting
    "one 2×C conv then split" form is 16% SLOWER end-to-end (225.9 vs
    190.3 ms/step) despite the bigger single matmul — the split+gate
    consumer defeats XLA's conv-epilogue fusion, so every BatchNorm apply
    and its backward reduction materializes the [B,T,F,2C] tensor
    (2.1 GB at block0, ~24 ms of pure HBM traffic in the device trace).
    Two separate C-channel convs keep each conv→BN fused exactly like
    ``ConvBlock``; only the final gate product itself is materialized.
    """

    channels: int
    pool: tuple[int, int] = (2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        for i in range(2):
            lin = nn.Conv(
                self.channels, (3, 3), padding="SAME", use_bias=False,
                kernel_init=_glorot, dtype=self.dtype, name=f"Conv_lin_{i}",
            )(x)
            gate = nn.Conv(
                self.channels, (3, 3), padding="SAME", use_bias=False,
                kernel_init=_glorot, dtype=self.dtype, name=f"Conv_gate_{i}",
            )(x)
            lin = BatchNorm(
                use_running_average=not train, momentum=0.9,
                dtype=self.dtype, name=f"BatchNorm_lin_{i}",
            )(lin)
            gate = BatchNorm(
                use_running_average=not train, momentum=0.9,
                dtype=self.dtype, name=f"BatchNorm_gate_{i}",
            )(gate)
            x = lin * nn.sigmoid(gate)
        if self.pool != (1, 1):
            x = avg_pool_2d(x, self.pool)
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
