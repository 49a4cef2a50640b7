"""Training core: train state, fused train/eval steps, device-side mixup.

Reference surface (SURVEY.md §2 "Train driver", §3.2): the step loop of
``pytorch/main.py:train`` — Adam(lr≈1e-3), clip-level BCE on weak labels,
optional mixup augmentation, periodic evaluation + checkpointing. The CLI
driver lives in ``main.py``; this module is the jitted compute.

TPU-native design:

* One jitted ``train_step`` contains (optionally) the fused Pallas log-mel
  frontend, normalization, mixup, forward, loss, backward and the Adam
  update — a single XLA program per step, no host round trips
  (the reference interleaves single-threaded HDF5 batch assembly with GPU
  steps; SURVEY.md §3.2 HOT LOOP #2).
* State is a pure pytree (params, batch_stats, opt_state, PRNG key, step);
  deterministic resume = restore the pytree (SURVEY.md §5 checkpoint row).
* Data parallel: jit over a 1-D mesh with the batch sharded on ``"data"``
  and state replicated; XLA derives the psum gradient all-reduce. The same
  code runs single-chip when the mesh has one device.
"""

from __future__ import annotations


from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from .config import Config, DEFAULT
from .losses import get_loss_func

__all__ = ["TrainState", "create_train_state", "default_optimizer",
           "resolve_opt_config", "make_train_step", "make_eval_step",
           "mixup", "spec_augment"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                  # scalar int32
    params: FrozenDict
    batch_stats: FrozenDict
    opt_state: optax.OptState
    rng: jax.Array                     # PRNG key for dropout/mixup


# Transformer-variant stabilizers (measured on the hard synthetic corpus,
# round 3): at the reference recipe (Adam 1e-3, batch 32, mixup) the
# CNN-Transformer never escaped class-prior predictions and by iter 3000
# had destabilized into saturated 0/1 outputs with exploding param norms
# (TransformerEncoderLayer ‖θ‖ 70→109, block3 46→111) — the classic
# no-warmup attention failure. Linear LR warmup + global-norm grad clipping
# are applied BY DEFAULT to ``seq=="transformer"`` models only; every other
# model family keeps the byte-identical reference recipe. Override with
# ``--warmup_steps`` / ``--grad_clip`` (0 disables).
TRANSFORMER_WARMUP_STEPS = 500
TRANSFORMER_GRAD_CLIP = 1.0


def resolve_opt_config(
    model,
    learning_rate: float = 1e-3,
    warmup_steps: Optional[int] = None,
    grad_clip: Optional[float] = None,
) -> dict:
    """The EFFECTIVE optimizer recipe after model-derived defaulting —
    the dict recorded in the checkpoint's ``.optjson`` sidecar
    (``checkpoints.save_checkpoint``) so eval/serving can rebuild the
    exact ``opt_state`` layout without re-passing CLI flags."""
    is_transformer = getattr(model, "seq", None) == "transformer"
    if warmup_steps is None:
        warmup_steps = TRANSFORMER_WARMUP_STEPS if is_transformer else 0
    if grad_clip is None:
        grad_clip = TRANSFORMER_GRAD_CLIP if is_transformer else 0.0
    return {"learning_rate": float(learning_rate),
            "warmup_steps": int(warmup_steps),
            "grad_clip": float(grad_clip)}


def default_optimizer(
    model,
    learning_rate: float = 1e-3,
    warmup_steps: Optional[int] = None,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam mirroring the reference (``Adam(lr=1e-3, betas=(0.9, 0.999))``),
    with model-derived stability defaults for transformer variants.

    The defaults are derived from the MODEL (``model.seq``), not the CLI, so
    every template-state builder (training, inference, serving, parity) gets
    a structurally identical ``opt_state`` for a given ``model_type`` and
    checkpoints interchange. NOTE: warmup/clip change the opt_state pytree
    (schedule count + clip stage), so transformer checkpoints written before
    round 3 need retraining — acceptable pre-1.0. Round 4 records the
    resolved recipe in a checkpoint sidecar (:func:`resolve_opt_config`).
    """
    rc = resolve_opt_config(model, learning_rate, warmup_steps, grad_clip)
    warmup_steps, grad_clip = rc["warmup_steps"], rc["grad_clip"]
    lr = (optax.linear_schedule(0.0, learning_rate, warmup_steps)
          if warmup_steps else learning_rate)
    tx = optax.adam(lr, b1=0.9, b2=0.999)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def create_train_state(
    model,
    cfg: Config = DEFAULT,
    learning_rate: float = 1e-3,
    seed: int = 0,
    example_frames: Optional[int] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    warmup_steps: Optional[int] = None,
    grad_clip: Optional[float] = None,
) -> tuple[TrainState, optax.GradientTransformation]:
    """Init params on an example log-mel batch; Adam mirrors the reference
    (``optimizer = Adam(lr=1e-3, betas=(0.9, 0.999))``), with transformer
    stability defaults — see :func:`default_optimizer`."""
    frames = example_frames or cfg.frames_num
    example = jnp.zeros((1, frames, cfg.mel_bins), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(seed)},
                           example, train=False)
    tx = optimizer or default_optimizer(model, learning_rate,
                                        warmup_steps, grad_clip)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(seed + 1),
    )
    return state, tx


def mixup(rng: jax.Array, x: jnp.ndarray, y: jnp.ndarray, alpha: float):
    """Device-side mixup (reference: ``utils/utilities.py:Mixup``,
    ``--augmentation=mixup``): pair each example with the batch reversed,
    per-example λ ~ Beta(α, α); targets mixed with the same λ."""
    lam = jax.random.beta(rng, alpha, alpha, (x.shape[0],))
    lam_x = lam.reshape((-1,) + (1,) * (x.ndim - 1))
    lam_y = lam.reshape((-1,) + (1,) * (y.ndim - 1))
    x2 = jnp.flip(x, axis=0)
    y2 = jnp.flip(y, axis=0)
    return lam_x * x + (1 - lam_x) * x2, lam_y * y + (1 - lam_y) * y2


def spec_augment(rng: jax.Array, x: jnp.ndarray,
                 time_masks: int = 2, time_width: int = 64,
                 freq_masks: int = 2, freq_width: int = 8) -> jnp.ndarray:
    """Device-side SpecAugment (Park et al. 2019): random time/freq masks on
    the log-mel batch ``[B, T, F]``. The reference only has mixup
    (SURVEY.md §2 "Augmentation"); this is a TPU-native extra, selected via
    ``--augmentation=specaugment`` / ``mixup_specaugment``. Masks are filled
    with the per-example mean so normalized statistics stay centered."""
    b, t, f = x.shape
    fill = jnp.mean(x, axis=(1, 2), keepdims=True)
    keys = jax.random.split(rng, 2 * (time_masks + freq_masks))
    k = iter(keys)

    tt = jnp.arange(t)[None, :, None]
    for _ in range(time_masks):
        start = jax.random.randint(next(k), (b, 1, 1), 0, max(1, t - time_width))
        width = jax.random.randint(next(k), (b, 1, 1), 0, time_width + 1)
        mask = (tt >= start) & (tt < start + width)
        x = jnp.where(mask, fill, x)
    ff = jnp.arange(f)[None, None, :]
    for _ in range(freq_masks):
        start = jax.random.randint(next(k), (b, 1, 1), 0, max(1, f - freq_width))
        width = jax.random.randint(next(k), (b, 1, 1), 0, freq_width + 1)
        mask = (ff >= start) & (ff < start + width)
        x = jnp.where(mask, fill, x)
    return x


def _fast_dropout_key(rng: jax.Array) -> jax.Array:
    """Derive an ``rbg``-impl key from a threefry key for dropout masks.

    The checkpointed train-state key stays threefry (stable serialized
    format); only the *mask generation* switches to the hardware RBG
    bit generator, which is markedly cheaper on TPU for the ~170M mask
    elements per step (measured −3 ms/step on v5e at bench config —
    threefry's rotate/xor chains showed up as ~2.4 ms pad_maximum +
    ~2.5 ms slice_bitcast fusions in the device trace).
    """
    seed = jax.random.bits(rng, (4,), jnp.uint32)
    return jax.random.wrap_key_data(seed, impl="rbg")


def _frontend_and_norm(batch_x, frontend, scalar, wave_scale=None):
    if wave_scale is not None and jnp.issubdtype(batch_x.dtype,
                                                jnp.integer):
        # quantized int16 waveforms shipped raw: decode on device with the
        # same ``int→f32 × scale`` the host view computes — bit-equal
        # output, half the host→device bytes (data/hdf5._ScaledWaveView)
        batch_x = batch_x.astype(jnp.float32) * jnp.float32(wave_scale)
    if frontend is not None:
        batch_x = frontend(batch_x)                 # waveform → logmel
    if scalar is not None:
        mean, std = scalar
        batch_x = (batch_x - mean) / jnp.maximum(std, 1e-8)
    return batch_x


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_type: str = "clip_bce",
    frontend: Optional[Callable] = None,
    scalar: Optional[tuple] = None,
    mixup_alpha: float = 0.0,
    use_spec_augment: bool = False,
    donate_state: bool = True,
    check_numerics: bool = False,
    bank: Optional[jax.Array] = None,
    wave_scale: Optional[float] = None,
    bank_frontend: Optional[Callable] = None,
):
    """Build the jitted train step ``(state, batch_x, batch_y) → (state, metrics)``.

    ``frontend`` (e.g. the Pallas log-mel) makes ``batch_x`` a waveform
    batch; ``scalar=(mean, std)`` applies on-device normalization;
    ``mixup_alpha > 0`` enables device-side mixup. ``check_numerics`` adds a
    non-finite count over loss+grads to the metrics (the SURVEY.md §5
    sanitizer role — JAX purity means there is no racing to detect; NaN/Inf
    surveillance is the useful runtime check), costing one reduction.

    ``bank`` switches the step to device-resident-corpus mode: ``bank`` is
    the whole split's example array staged in HBM ``[N, ...]`` and the step
    signature becomes ``(state, batch_idx, batch_y)`` — the example rows are
    gathered ON DEVICE (``jnp.take``), so the per-step host→device transfer
    shrinks from the full feature batch to an int32 index vector. Classic
    TPU shape: HBM is large (16 GB/chip) and reused every epoch, while the
    host link pays the corpus once instead of once per epoch. The bank is
    passed as a jit argument (not a closure) so XLA never folds the staged
    corpus into the executable as a constant.

    ``bank_frontend`` (with ``bank``) replaces the gather-then-frontend
    formulation with a fused ``(bank, idx) → logmel`` closure
    (``ops.stft.make_logmel_bank_fn``): the Pallas kernel gathers the
    clip rows straight from the staged bank via a scalar-prefetched index
    map and decodes int16 in-kernel — the materialized batch and its
    decoded f32 copy never touch HBM. Normalization still applies here.
    """
    loss_fn = get_loss_func(loss_type)
    scalar = (None if scalar is None else
              (jnp.asarray(scalar[0]), jnp.asarray(scalar[1])))

    def step_fn(state: TrainState, batch_x, batch_y, *, melled=False):
        rng, mix_rng, spec_rng, drop_rng = jax.random.split(state.rng, 4)
        x = (_frontend_and_norm(batch_x, None, scalar) if melled
             else _frontend_and_norm(batch_x, frontend, scalar, wave_scale))
        y = batch_y
        if use_spec_augment:
            x = spec_augment(spec_rng, x)
        if mixup_alpha > 0.0:
            x, y = mixup(mix_rng, x, y, mixup_alpha)

        dropout_key = _fast_dropout_key(drop_rng)

        def loss_of(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, rngs={"dropout": dropout_key},
                mutable=["batch_stats"])
            return loss_fn(out, y), (out, mutated["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_stats,
            opt_state=new_opt, rng=rng)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        if check_numerics:
            bad = sum(
                jnp.sum(~jnp.isfinite(g)) for g in
                jax.tree_util.tree_leaves(grads)
            ) + jnp.sum(~jnp.isfinite(loss))
            metrics["nonfinite_count"] = bad
        return new_state, metrics

    donate = (0,) if donate_state else ()
    if bank is None:
        return jax.jit(step_fn, donate_argnums=donate,
                       compiler_options=_tpu_compiler_options())

    if bank_frontend is not None:
        def bank_step_fn(state: TrainState, bank_arr, batch_idx, batch_y):
            return step_fn(state, bank_frontend(bank_arr, batch_idx),
                           batch_y, melled=True)
    else:
        def bank_step_fn(state: TrainState, bank_arr, batch_idx, batch_y):
            return step_fn(state, jnp.take(bank_arr, batch_idx, axis=0),
                           batch_y)

    jitted = jax.jit(bank_step_fn, donate_argnums=donate,
                     compiler_options=_tpu_compiler_options())
    return lambda state, batch_idx, batch_y: jitted(
        state, bank, batch_idx, batch_y)


def _tpu_compiler_options():
    """Raising the scoped-VMEM budget lets the TPU conv emitters pick larger
    tiles (round-1 HLO: conv fusions capped at ~12-16 MB scoped memory);
    measured −2 ms/step on the v5e bench config, flat from 48 to 96 MB."""
    if jax.default_backend() != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": "49152"}


def make_eval_step(model, frontend: Optional[Callable] = None,
                   scalar: Optional[tuple] = None,
                   bank: Optional[jax.Array] = None,
                   wave_scale: Optional[float] = None,
                   bank_frontend: Optional[Callable] = None):
    """Jitted inference step ``(state, batch_x) → output_dict`` (eval mode,
    running BN stats — reference ``pytorch_utils.forward`` semantics).

    With ``bank`` (a device-staged split ``[N, ...]``), the returned step is
    ``(state, batch_idx) → output_dict`` — rows gathered on device, same
    device-resident-corpus mode as :func:`make_train_step`. The underlying
    jitted program takes the bank as an argument, so steps over differently
    sized banks (train vs test split) share nothing but the compile cache.
    """
    scalar = (None if scalar is None else
              (jnp.asarray(scalar[0]), jnp.asarray(scalar[1])))

    def eval_fn(state: TrainState, batch_x, *, melled=False):
        x = (_frontend_and_norm(batch_x, None, scalar) if melled
             else _frontend_and_norm(batch_x, frontend, scalar, wave_scale))
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)

    if bank is None:
        return jax.jit(eval_fn)

    if bank_frontend is not None:
        def bank_eval_fn(state: TrainState, bank_arr, batch_idx):
            return eval_fn(state, bank_frontend(bank_arr, batch_idx),
                           melled=True)
    else:
        def bank_eval_fn(state: TrainState, bank_arr, batch_idx):
            return eval_fn(state, jnp.take(bank_arr, batch_idx, axis=0))

    jitted = jax.jit(bank_eval_fn)
    return lambda state, batch_idx: jitted(state, bank, batch_idx)


def forward_generator(eval_step, state, generate_func,
                      return_target: bool = True, sharding=None,
                      prefetch: int = 2) -> dict:
    """Accumulate model outputs over a finite generator as numpy arrays.

    Mirrors reference ``pytorch/pytorch_utils.py:forward`` — returns a dict
    with ``clipwise_output``, ``framewise_output`` and (optionally)
    ``target``.

    ``sharding`` (a batch :class:`NamedSharding`) distributes each eval
    batch across the mesh instead of replicating the forward on every chip;
    ragged final batches are zero-padded up to the mesh size and the
    padding rows trimmed from the outputs (padding can't change real rows —
    the models have no cross-example coupling in eval mode).

    ``prefetch`` stages batches (HDF5 read + pad + ``device_put``) from a
    background thread so host IO overlaps device compute — the training
    loop has had this since round 1 (``data/generator.py``); round 4's
    verdict flagged that the forward path serialized read → put → step,
    leaving the chip idle during every HDF5 read (lazy-mode inference at
    51k-clip scale is where it bites). ``prefetch=0`` restores the serial
    path.
    """
    from .data.generator import prefetch_to_device

    acc: dict = {"clipwise_output": [], "framewise_output": []}
    if return_target:
        acc["target"] = []
    n_dev = sharding.mesh.size if sharding is not None else 1

    def stage(batch):
        """Producer-thread work: pad the ragged final batch to the mesh
        size and place features on device; targets stay host numpy."""
        batch_x, batch_y = batch
        n = batch_x.shape[0]
        if sharding is not None:
            pad = (-n) % n_dev
            if pad:
                batch_x = np.concatenate(
                    [batch_x, np.zeros((pad,) + batch_x.shape[1:],
                                       batch_x.dtype)])
            batch_x = jax.device_put(batch_x, sharding)
        else:
            batch_x = jax.device_put(batch_x)
        return n, batch_x, batch_y

    staged = (prefetch_to_device(generate_func, size=prefetch, stage=stage)
              if prefetch else map(stage, generate_func))
    for n, batch_x, batch_y in staged:
        out = eval_step(state, batch_x)
        acc["clipwise_output"].append(
            np.asarray(out["clipwise_output"])[:n])
        acc["framewise_output"].append(
            np.asarray(out["framewise_output"])[:n])
        if return_target:
            acc["target"].append(np.asarray(batch_y))
    return {k: np.concatenate(v, axis=0) for k, v in acc.items()}
