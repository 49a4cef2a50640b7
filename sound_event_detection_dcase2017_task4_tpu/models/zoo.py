"""Model zoo: weak-label audio tagging + SED models (flax linen).

TPU-native re-design of the reference's model zoo
(reference: ``pytorch/models.py`` — CNN tagging models with max/avg/attention
pooling, gated-GLU CNN, CRNN with BiGRU, CNN-Transformer; model classes are
selected by the ``--model_type`` CLI string; SURVEY.md §2/§3.4).

Every model takes a log-mel batch ``[B, T, mel]`` and returns::

    {"clipwise_output":  [B, classes]   sigmoid probabilities,
     "framewise_output": [B, T, classes] sigmoid probabilities (SED),
     "embedding":        [B, T', D]     pre-head features}

Framewise outputs are nearest-neighbour upsampled by the total time-pooling
ratio and padded back to ``T`` frames (reference:
``pytorch/pytorch_utils.py:{interpolate,pad_framewise_output}``), so SED
event decoding always runs at the input frame rate (100 fps).

TPU-first choices: NHWC convs, bf16 compute dtype available throughout,
``lax.scan``-based BiGRU over the short post-pooling sequence (~62 steps),
all heads fully batched — no data-dependent shapes anywhere.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..config import classes_num as _default_classes
from .blocks import (AttBlock, ConvBlock, Dropout, GLUBlock,
                     interpolate, pad_framewise_output)

__all__ = ["SedCnn", "MODEL_REGISTRY", "get_model"]

_glorot = nn.initializers.glorot_uniform()


class BiGRU(nn.Module):
    """Bidirectional GRU over time (reference: ``init_gru`` + BiGRU in the
    CRNN classes; SURVEY.md §2 "CRNN model"). ``[B, T, D] → [B, T, 2*hidden]``.

    A sequential ``lax.scan`` per direction — cheap at the ~62-step
    post-pooling sequence length (SURVEY.md §7 hard parts: do not Pallas-ize).
    """

    hidden: int = 256
    dtype: jnp.dtype = jnp.float32
    unroll: int = 8   # scan unroll factor — lets XLA fuse across steps
                      # (SURVEY.md §7: "unrolling 4–8 steps helps XLA")

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fwd = nn.RNN(nn.GRUCell(self.hidden, dtype=self.dtype,
                                kernel_init=_glorot), unroll=self.unroll)
        bwd = nn.RNN(nn.GRUCell(self.hidden, dtype=self.dtype,
                                kernel_init=_glorot), reverse=True,
                     keep_order=True, unroll=self.unroll)
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm Transformer encoder block over time frames.

    Reference: hand-rolled multi-head block in ``pytorch/models.py`` for the
    CNN-Transformer classes (SURVEY.md §2 "CNN-Transformer model"; the
    companion paper's headline model, arXiv:1912.04761).
    """

    num_heads: int = 8
    mlp_ratio: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        d = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.SelfAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=not train,
        )(h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(d * self.mlp_ratio, dtype=self.dtype,
                     kernel_init=_glorot)(h)
        h = nn.gelu(h)
        h = nn.Dense(d, dtype=self.dtype, kernel_init=_glorot)(h)
        h = Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class SedCnn(nn.Module):
    """Configurable CNN[-GLU][-GRU/-Transformer] tagging + SED model.

    One parameterised module covers the reference's whole ``--model_type``
    zoo (the registry below instantiates named configurations):

    * ``block="conv"|"glu"`` — plain ConvBlock stack or gated-GLU stack
    * ``channels`` — stack widths, 2×2 pooled after each block
    * ``seq="none"|"gru"|"transformer"`` — temporal model on frame features
    * ``head="max"|"avg"|"att"|"lin"|"exp"`` — clipwise aggregation over
      frames (MIL; ``lin``/``exp`` are the linear-/exp-softmax poolings of
      arXiv:1810.09050)
    """

    classes_num: int = _default_classes
    channels: Sequence[int] = (64, 128, 256, 512)
    block: str = "conv"
    seq: str = "none"
    head: str = "att"
    gru_hidden: int = 256
    transformer_layers: int = 2
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32
    # rematerialize conv blocks in backward: the first block's activations
    # are [B, 1001, 64, 64] (≈4 GB at batch 256 f32) — remat trades ~20%
    # FLOPs for O(block) instead of O(network) activation memory, unlocking
    # large batches on a 16 GB v5e chip.
    remat: bool = False

    @nn.compact
    def __call__(self, logmel: jnp.ndarray, train: bool = False) -> dict:
        frames_num = logmel.shape[1]
        x = logmel[..., None].astype(self.dtype)              # [B, T, F, 1]

        block_cls = {"conv": ConvBlock, "glu": GLUBlock}[self.block]
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        for i, ch in enumerate(self.channels):
            # explicit name: nn.remat would otherwise prefix the module path
            # ("CheckpointConvBlock_i"), making remat / non-remat
            # checkpoints incompatible.
            x = block_cls(ch, pool=(2, 2), dtype=self.dtype,
                          name=f"block{i}")(x, train)
            x = Dropout(self.dropout, deterministic=not train)(x)

        x = jnp.mean(x, axis=2)                               # freq mean [B,T',C]

        if self.seq == "gru":
            x = BiGRU(self.gru_hidden, dtype=self.dtype)(x)
        elif self.seq == "transformer":
            # input LayerNorm: raw post-ReLU conv activations otherwise
            # dominate the residual stream and saturate the heads at init
            x = nn.LayerNorm(dtype=self.dtype)(x)
            # sinusoidal positional encoding: self-attention is otherwise
            # permutation-invariant over frames and cannot localize events
            t, d = x.shape[1], x.shape[2]
            pos = jnp.arange(t)[:, None].astype(jnp.float32)
            div = jnp.exp(jnp.arange(0, d, 2) * (-jnp.log(10000.0) / d))
            pe = jnp.zeros((t, d))
            pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
            pe = pe.at[:, 1::2].set(jnp.cos(pos * div[: (d + 1) // 2]))
            x = x + pe[None].astype(x.dtype)
            for _ in range(self.transformer_layers):
                x = TransformerEncoderLayer(dtype=self.dtype)(x, train)

        embedding = x

        if self.head == "att":
            clipwise, framewise = AttBlock(self.classes_num,
                                           dtype=self.dtype)(x)
        else:
            framewise = nn.sigmoid(
                nn.Dense(self.classes_num, kernel_init=_glorot,
                         dtype=self.dtype)(x).astype(jnp.float32))
            if self.head == "max":
                clipwise = jnp.max(framewise, axis=1)
            elif self.head == "avg":
                clipwise = jnp.mean(framewise, axis=1)
            elif self.head == "lin":
                # linear-softmax MIL pooling (Wang et al. 2019,
                # arXiv:1810.09050 — the best localizer of the five
                # pooling functions compared there): Σy² / Σy per class,
                # self-weighted so confident frames dominate without
                # max-pooling's single-frame gradient
                clipwise = ((framewise ** 2).sum(axis=1)
                            / jnp.maximum(framewise.sum(axis=1), 1e-7))
            elif self.head == "exp":
                # exp-softmax MIL pooling (same comparison): Σ y·e^y / Σ e^y
                w = jnp.exp(framewise)
                clipwise = ((framewise * w).sum(axis=1)
                            / jnp.maximum(w.sum(axis=1), 1e-7))
            else:
                raise ValueError(f"unknown head {self.head!r}")

        ratio = 2 ** len(self.channels)
        framewise = pad_framewise_output(
            interpolate(framewise.astype(jnp.float32), ratio), frames_num)

        return {
            "clipwise_output": clipwise.astype(jnp.float32),
            "framewise_output": framewise,
            "embedding": embedding,
        }


def _cfg(**kw):
    return kw


# Reference --model_type names → constructor configs (names reconstructed
# from the Kong DCASE repo family, SURVEY.md §2; BASELINE.json configs:
# CNN tagging / Gated-CNN(GLU)+att / CRNN BiGRU / frame-level SED).
MODEL_REGISTRY: dict[str, dict] = {
    # plain CNN tagging at three depths
    "Cnn_5layers_AvgPooling": _cfg(channels=(64, 128), head="avg"),
    "Cnn_9layers_MaxPooling": _cfg(head="max"),
    "Cnn_9layers_AvgPooling": _cfg(head="avg"),
    "Cnn_9layers_AttPooling": _cfg(head="att"),
    # linear-/exp-softmax MIL pooling (arXiv:1810.09050's comparison —
    # linear softmax is its best localizer; TPU-native extras beyond the
    # reference's max/avg/att)
    "Cnn_9layers_LinPooling": _cfg(head="lin"),
    "Cnn_9layers_ExpPooling": _cfg(head="exp"),
    "Cnn_9layers_Gru_FrameLin": _cfg(seq="gru", head="lin"),
    "Cnn_13layers_AvgPooling": _cfg(
        channels=(64, 128, 256, 512, 1024, 2048), head="avg"),
    # gated-GLU CNN with attention pooling (BASELINE.json config #2)
    "Cnn_9layers_Glu_AttPooling": _cfg(block="glu", head="att"),
    # CRNN: conv stack + BiGRU (BASELINE.json config #3)
    "Cnn_9layers_Gru_FrameAvg": _cfg(seq="gru", head="avg"),
    "Cnn_9layers_Gru_FrameMax": _cfg(seq="gru", head="max"),
    "Cnn_9layers_Gru_FrameAtt": _cfg(seq="gru", head="att"),
    # CNN-Transformer (companion-paper model; optional for parity)
    "Cnn_9layers_Transformer_FrameAvg": _cfg(seq="transformer", head="avg"),
    "Cnn_9layers_Transformer_FrameAtt": _cfg(seq="transformer", head="att"),
    # alternative reference naming (SURVEY.md §2 lists both patterns with
    # MED confidence — `Cnn_9layers_Frame{Max,Avg,Att}` aliases the plain
    # 9-layer CNN with the same head, so either spelling of --model_type
    # resolves)
    "Cnn_9layers_FrameMax": _cfg(head="max"),
    "Cnn_9layers_FrameAvg": _cfg(head="avg"),
    "Cnn_9layers_FrameAtt": _cfg(head="att"),
}


def get_model(model_type: str, classes_num: int = _default_classes,
              dtype: jnp.dtype = jnp.float32, remat: bool = False) -> SedCnn:
    """Instantiate a model by its reference ``--model_type`` string."""
    if model_type not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model_type {model_type!r}; available: "
            f"{sorted(MODEL_REGISTRY)}")
    return SedCnn(classes_num=classes_num, dtype=dtype, remat=remat,
                  **MODEL_REGISTRY[model_type])
