"""Device-resident corpus cache: transport equivalence proofs.

Round-5 perf work (``main._build`` "device cache", ``train.make_train_step
(bank=...)``): training stages the normalized feature splits in device HBM
once and moves only an int32 index vector per step. These tests pin the
non-negotiable property — the cached transport trains on the SAME batch
stream and computes the SAME numbers as the host-fed transport — plus the
sharded-gather path on the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_dcase2017_task4_tpu import train
from sound_event_detection_dcase2017_task4_tpu.config import Config
from sound_event_detection_dcase2017_task4_tpu.data.generator import (
    DataGenerator)
from sound_event_detection_dcase2017_task4_tpu.data.hdf5 import scale
from sound_event_detection_dcase2017_task4_tpu.models import SedCnn
from sound_event_detection_dcase2017_task4_tpu.parallel import (
    batch_sharding, replicated_sharding)

CLASSES = 17
N, T, F = 20, 96, 64


class _Reader:
    """Minimal SplitReader-shaped in-memory split."""

    def __init__(self, seed=0):
        rng = np.random.RandomState(seed)
        self.feature = rng.randn(N, T, F).astype(np.float32) * 10 - 30
        self.target = (rng.rand(N, CLASSES) < 0.2).astype(np.float32)
        self.waveform = None
        self.audio_names = [f"c{i}.wav" for i in range(N)]

    def __len__(self):
        return N


@pytest.fixture(scope="module")
def reader():
    return _Reader()


@pytest.fixture(scope="module")
def scalar(reader):
    return (reader.feature.mean(axis=(0, 1)),
            reader.feature.std(axis=(0, 1)))


def test_index_stream_matches_feature_stream(reader, scalar):
    """Same seed ⇒ yield_indices picks exactly the rows the feature
    transport would have yielded, in the same order."""
    ga = DataGenerator(reader, batch_size=8, scalar=scalar, seed=7)
    gb = DataGenerator(reader, batch_size=8, scalar=scalar, seed=7)
    feats = ga.generate_train()
    idxs = gb.generate_train(yield_indices=True)
    for _ in range(6):                       # crosses an epoch boundary
        xa, ya = next(feats)
        idx, yb = next(idxs)
        assert idx.dtype == np.int32
        np.testing.assert_array_equal(
            xa, scale(reader.feature[idx], *scalar).astype(np.float32))
        np.testing.assert_array_equal(ya, yb)


def test_validate_index_stream(reader, scalar):
    g = DataGenerator(reader, validate=reader, batch_size=8, scalar=scalar)
    batches = list(g.generate_validate("validate", yield_indices=True))
    assert [len(i) for i, _ in batches] == [8, 8, 4]   # ragged tail kept
    np.testing.assert_array_equal(np.concatenate([i for i, _ in batches]),
                                  np.arange(N))


@pytest.fixture(scope="module")
def tiny_model():
    return SedCnn(classes_num=CLASSES, channels=(16, 32), head="att")


def _init_state(tiny_model, seed=3):
    return train.create_train_state(tiny_model, Config(),
                                    example_frames=T, seed=seed)


def test_train_step_bank_equals_host(tiny_model, reader, scalar):
    """3 steps through each transport from the same init ⇒ identical
    params. Gather-then-compute and feed-then-compute are the same
    arithmetic; only the transport differs."""
    norm = scale(reader.feature, *scalar).astype(np.float32)
    bank = jnp.asarray(norm)
    state_h, tx = _init_state(tiny_model)
    state_b, _ = _init_state(tiny_model)
    step_h = train.make_train_step(tiny_model, tx, donate_state=False)
    step_b = train.make_train_step(tiny_model, tx, donate_state=False,
                                   bank=bank)
    gh = DataGenerator(reader, batch_size=8, scalar=scalar, seed=5)
    gb = DataGenerator(reader, batch_size=8, scalar=scalar, seed=5)
    feats, idxs = gh.generate_train(), gb.generate_train(yield_indices=True)
    for _ in range(3):
        x, y = next(feats)
        state_h, mh = step_h(state_h, jnp.asarray(x), jnp.asarray(y))
        idx, yb = next(idxs)
        state_b, mb = step_b(state_b, jnp.asarray(idx), jnp.asarray(yb))
        np.testing.assert_allclose(float(mh["loss"]), float(mb["loss"]),
                                   rtol=1e-6)
    for ph, pb in zip(jax.tree_util.tree_leaves(state_h.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(ph), np.asarray(pb),
                                   rtol=1e-5, atol=1e-7)


def test_eval_step_bank_equals_host(tiny_model, reader, scalar):
    norm = scale(reader.feature, *scalar).astype(np.float32)
    state, _ = _init_state(tiny_model)
    ev_h = train.make_eval_step(tiny_model)
    ev_b = train.make_eval_step(tiny_model, bank=jnp.asarray(norm))
    idx = np.asarray([3, 7, 11, 19], np.int32)
    out_h = ev_h(state, jnp.asarray(norm[idx]))
    out_b = ev_b(state, jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(out_h["clipwise_output"]),
                               np.asarray(out_b["clipwise_output"]),
                               rtol=1e-6, atol=1e-7)


class _WaveCorpus:
    """Tiny quantized waveform corpus: int16 samples + PCM scale."""

    SCALE = np.float32(1.0 / 32768.0)

    def __init__(self, seed=11, n=12, samples=16000):
        rng = np.random.RandomState(seed)
        self.raw = (rng.randn(n, samples) * 6000).clip(
            -32768, 32767).astype(np.int16)
        self.target = (rng.rand(n, CLASSES) < 0.2).astype(np.float32)


def test_train_step_waveform_chunk_bank_equals_host(tiny_model):
    """The round-5 waveform device cache: int16 hop-chunk rows staged in
    HBM, gathered by index, decoded + un-staged + frontend'd inside the
    step — must train identically to the host-fed raw-int16 transport
    (the XLA frontend fallback un-stages 3-D chunks on CPU)."""
    from sound_event_detection_dcase2017_task4_tpu.ops.pallas_logmel import (
        prepare_chunks)
    from sound_event_detection_dcase2017_task4_tpu.ops.stft import (
        make_logmel_fn)

    cfg = Config(clip_samples=16000)
    corpus = _WaveCorpus()
    frontend = make_logmel_fn(cfg)
    # mel-domain scalar from the decoded corpus (what calculate_scalar does)
    mel = np.asarray(frontend(
        jnp.asarray(corpus.raw, jnp.float32) * corpus.SCALE))
    dev_scalar = (mel.mean(axis=(0, 1)), mel.std(axis=(0, 1)))
    frames = 1 + 16000 // cfg.hop_size

    def init():
        return train.create_train_state(tiny_model, cfg,
                                        example_frames=frames, seed=3)

    state_h, tx = init()
    state_b, _ = init()
    step_h = train.make_train_step(
        tiny_model, tx, frontend=frontend, scalar=dev_scalar,
        wave_scale=float(corpus.SCALE), donate_state=False)
    bank = jnp.asarray(prepare_chunks(corpus.raw, cfg))
    assert bank.dtype == jnp.int16            # staged undecoded
    step_b = train.make_train_step(
        tiny_model, tx, frontend=frontend, scalar=dev_scalar,
        wave_scale=float(corpus.SCALE), donate_state=False, bank=bank)

    rng = np.random.RandomState(0)
    for _ in range(2):
        idx = np.sort(rng.choice(len(corpus.raw), 6, replace=False)
                      ).astype(np.int32)
        y = corpus.target[idx]
        state_h, mh = step_h(state_h, jnp.asarray(corpus.raw[idx]),
                             jnp.asarray(y))
        state_b, mb = step_b(state_b, jnp.asarray(idx), jnp.asarray(y))
        np.testing.assert_allclose(float(mh["loss"]), float(mb["loss"]),
                                   rtol=1e-6)
    for ph, pb in zip(jax.tree_util.tree_leaves(state_h.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(ph), np.asarray(pb),
                                   rtol=1e-5, atol=1e-7)


def test_eval_step_waveform_chunk_bank_equals_host(tiny_model):
    from sound_event_detection_dcase2017_task4_tpu.ops.pallas_logmel import (
        prepare_chunks)
    from sound_event_detection_dcase2017_task4_tpu.ops.stft import (
        make_logmel_fn)

    cfg = Config(clip_samples=16000)
    corpus = _WaveCorpus(seed=12)
    frontend = make_logmel_fn(cfg)
    mel = np.asarray(frontend(
        jnp.asarray(corpus.raw, jnp.float32) * corpus.SCALE))
    dev_scalar = (mel.mean(axis=(0, 1)), mel.std(axis=(0, 1)))
    frames = 1 + 16000 // cfg.hop_size
    state, _ = train.create_train_state(tiny_model, cfg,
                                        example_frames=frames, seed=3)
    ev_h = train.make_eval_step(tiny_model, frontend=frontend,
                                scalar=dev_scalar,
                                wave_scale=float(corpus.SCALE))
    ev_b = train.make_eval_step(
        tiny_model, frontend=frontend, scalar=dev_scalar,
        wave_scale=float(corpus.SCALE),
        bank=jnp.asarray(prepare_chunks(corpus.raw, cfg)))
    idx = np.asarray([1, 4, 9], np.int32)
    out_h = ev_h(state, jnp.asarray(corpus.raw[idx]))
    out_b = ev_b(state, jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(out_h["clipwise_output"]),
                               np.asarray(out_b["clipwise_output"]),
                               rtol=1e-6, atol=1e-7)


def test_train_step_bank_frontend_equals_host(tiny_model):
    """The fused gather+decode+frontend formulation (`bank_frontend` =
    make_logmel_bank_fn; on TPU the Pallas scalar-prefetch kernel, here
    the bit-consistent XLA fallback) must train identically to the
    host-fed raw-int16 transport."""
    from sound_event_detection_dcase2017_task4_tpu.ops.pallas_logmel import (
        prepare_chunks)
    from sound_event_detection_dcase2017_task4_tpu.ops.stft import (
        make_logmel_bank_fn, make_logmel_fn)

    cfg = Config(clip_samples=16000)
    corpus = _WaveCorpus(seed=21)
    frontend = make_logmel_fn(cfg)
    mel = np.asarray(frontend(
        jnp.asarray(corpus.raw, jnp.float32) * corpus.SCALE))
    dev_scalar = (mel.mean(axis=(0, 1)), mel.std(axis=(0, 1)))
    frames = 1 + 16000 // cfg.hop_size

    def init():
        return train.create_train_state(tiny_model, cfg,
                                        example_frames=frames, seed=5)

    state_h, tx = init()
    state_b, _ = init()
    step_h = train.make_train_step(
        tiny_model, tx, frontend=frontend, scalar=dev_scalar,
        wave_scale=float(corpus.SCALE), donate_state=False)
    bank = jnp.asarray(prepare_chunks(corpus.raw, cfg))
    step_b = train.make_train_step(
        tiny_model, tx, frontend=frontend, scalar=dev_scalar,
        wave_scale=float(corpus.SCALE), donate_state=False, bank=bank,
        bank_frontend=make_logmel_bank_fn(cfg,
                                          wave_scale=float(corpus.SCALE)))

    rng = np.random.RandomState(7)
    for _ in range(2):
        idx = np.sort(rng.choice(len(corpus.raw), 6, replace=False)
                      ).astype(np.int32)
        y = corpus.target[idx]
        state_h, mh = step_h(state_h, jnp.asarray(corpus.raw[idx]),
                             jnp.asarray(y))
        state_b, mb = step_b(state_b, jnp.asarray(idx), jnp.asarray(y))
        np.testing.assert_allclose(float(mh["loss"]), float(mb["loss"]),
                                   rtol=1e-6)
    for ph, pb in zip(jax.tree_util.tree_leaves(state_h.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(ph), np.asarray(pb),
                                   rtol=1e-5, atol=1e-7)


def test_eval_step_bank_frontend_equals_host(tiny_model):
    from sound_event_detection_dcase2017_task4_tpu.ops.pallas_logmel import (
        prepare_chunks)
    from sound_event_detection_dcase2017_task4_tpu.ops.stft import (
        make_logmel_bank_fn, make_logmel_fn)

    cfg = Config(clip_samples=16000)
    corpus = _WaveCorpus(seed=22)
    frontend = make_logmel_fn(cfg)
    mel = np.asarray(frontend(
        jnp.asarray(corpus.raw, jnp.float32) * corpus.SCALE))
    dev_scalar = (mel.mean(axis=(0, 1)), mel.std(axis=(0, 1)))
    frames = 1 + 16000 // cfg.hop_size
    state, _ = train.create_train_state(tiny_model, cfg,
                                        example_frames=frames, seed=5)
    ev_h = train.make_eval_step(tiny_model, frontend=frontend,
                                scalar=dev_scalar,
                                wave_scale=float(corpus.SCALE))
    ev_b = train.make_eval_step(
        tiny_model, frontend=frontend, scalar=dev_scalar,
        wave_scale=float(corpus.SCALE),
        bank=jnp.asarray(prepare_chunks(corpus.raw, cfg)),
        bank_frontend=make_logmel_bank_fn(cfg,
                                          wave_scale=float(corpus.SCALE)))
    idx = np.asarray([0, 5, 10], np.int32)
    out_h = ev_h(state, jnp.asarray(corpus.raw[idx]))
    out_b = ev_b(state, jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(out_h["clipwise_output"]),
                               np.asarray(out_b["clipwise_output"]),
                               rtol=1e-6, atol=1e-7)


def test_bank_step_sharded_mesh(tiny_model, reader, scalar):
    """Replicated bank + data-sharded indices on the 8-device virtual mesh:
    the on-device gather needs no collective and reproduces the
    single-device loss."""
    from sound_event_detection_dcase2017_task4_tpu.parallel.mesh import (
        make_mesh_for_batch)

    mesh = make_mesh_for_batch(8)
    assert mesh.size == 8                     # conftest forces 8 devices
    norm = scale(reader.feature, *scalar).astype(np.float32)
    bank = jax.device_put(norm, replicated_sharding(mesh))
    state, tx = _init_state(tiny_model)
    state = jax.device_put(state, replicated_sharding(mesh))
    step = train.make_train_step(tiny_model, tx, donate_state=False,
                                 bank=bank)
    idx = np.arange(8, dtype=np.int32)
    y = reader.target[idx]
    bsh = batch_sharding(mesh)
    state2, m = step(state, jax.device_put(idx, bsh),
                     jax.device_put(y, bsh))

    ref_state, tx2 = _init_state(tiny_model)
    ref_step = train.make_train_step(tiny_model, tx2, donate_state=False,
                                     bank=jnp.asarray(norm))
    _, ref_m = ref_step(ref_state, jnp.asarray(idx), jnp.asarray(y))
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               rtol=1e-6)
