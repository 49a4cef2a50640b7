"""Data layer tests: HDF5 contract, scalar, generator, lazy mode, prefetch."""

import os

import numpy as np
import pytest

from sound_event_detection_dcase2017_task4_tpu.config import Config
from sound_event_detection_dcase2017_task4_tpu.data import (
    DataGenerator, calculate_scalar, holdout_indices, load_scalar,
    make_synthetic_dataset, pack_waveforms_to_hdf5, pad_or_truncate,
    prefetch_to_device, read_split, scale, subset_reader)


@pytest.fixture(scope="module")
def split_h5(tmp_path_factory):
    cfg = Config(clip_samples=16000)
    clips = make_synthetic_dataset(10, cfg, seed=0)
    path = str(tmp_path_factory.mktemp("h5") / "training.h5")
    pack_waveforms_to_hdf5(
        (c.waveform for c in clips), [c.audio_name for c in clips],
        np.stack([c.weak_target for c in clips]), path, cfg,
        store_waveform=True, batch_size=4)
    return path, cfg, clips


def test_hdf5_layout(split_h5):
    import h5py

    path, cfg, clips = split_h5
    with h5py.File(path, "r") as hf:
        assert set(hf.keys()) == {"audio_name", "feature", "target",
                                  "waveform"}
        assert hf["feature"].shape == (10, cfg.frames_num, cfg.mel_bins)
        assert hf["feature"].dtype == np.float32
        assert hf["target"].shape == (10, 17)
        assert hf["waveform"].shape == (10, cfg.clip_samples)
        assert hf.attrs["sample_rate"] == cfg.sample_rate


def test_packed_features_match_direct_logmel(split_h5):
    from sound_event_detection_dcase2017_task4_tpu.ops.stft import logmel

    path, cfg, clips = split_h5
    r = read_split(path)
    direct = np.asarray(logmel(clips[3].waveform[None], cfg))[0]
    np.testing.assert_allclose(r.feature[3], direct, atol=1e-4)


def test_lazy_reader_matches_memory(split_h5):
    path, cfg, _ = split_h5
    mem = read_split(path, load_waveform=True, in_memory=True)
    lazy = read_split(path, load_waveform=True, in_memory=False)
    idx = np.array([1, 4, 7])
    np.testing.assert_array_equal(mem.feature[idx], lazy.feature[idx])
    np.testing.assert_array_equal(mem.waveform[idx], lazy.waveform[idx])
    assert mem.audio_names == lazy.audio_names
    lazy.close()


def test_scalar_roundtrip(split_h5, tmp_path):
    path, cfg, _ = split_h5
    scalar_path = str(tmp_path / "scalar.h5")
    mean, std = calculate_scalar(path, scalar_path)
    assert mean.shape == std.shape == (cfg.mel_bins,)
    m2, s2 = load_scalar(scalar_path)
    np.testing.assert_allclose(mean, m2)
    np.testing.assert_allclose(std, s2)
    # normalization: scaled training data has ~zero mean / unit std
    r = read_split(path)
    scaled = scale(r.feature.reshape(-1, cfg.mel_bins), mean, std)
    np.testing.assert_allclose(scaled.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(scaled.std(axis=0), 1.0, atol=1e-3)


def test_generator_shapes_and_determinism(split_h5):
    path, cfg, _ = split_h5
    r = read_split(path)
    g1 = DataGenerator(r, batch_size=4, seed=7).generate_train()
    g2 = DataGenerator(r, batch_size=4, seed=7).generate_train()
    for _ in range(5):
        (x1, y1), (x2, y2) = next(g1), next(g2)
        assert x1.shape == (4, cfg.frames_num, cfg.mel_bins)
        assert y1.shape == (4, 17)
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)


def test_generator_validate_covers_split(split_h5):
    path, _, _ = split_h5
    r = read_split(path)
    gen = DataGenerator(r, validate=r, batch_size=4)
    batches = list(gen.generate_validate("validate"))
    assert sum(b[0].shape[0] for b in batches) == 10  # ragged last batch


def test_generator_waveform_source(split_h5):
    path, cfg, _ = split_h5
    r = read_split(path, load_waveform=True)
    gen = DataGenerator(r, batch_size=2, feature_source="waveform")
    x, y = next(gen.generate_train())
    assert x.shape == (2, cfg.clip_samples)


def test_generator_raw_int16_transport(split_h5):
    """raw_int16 mode yields the undecoded samples; a device-side
    ``int→f32 × scale`` reproduces the host decode bit-exactly (the
    train step's ``wave_scale`` contract, round 5)."""
    path, cfg, _ = split_h5
    r = read_split(path, load_waveform=True)
    assert hasattr(r.waveform, "scale")          # int16 is the default
    gen_f = DataGenerator(r, batch_size=2, feature_source="waveform",
                          seed=11)
    gen_i = DataGenerator(r, batch_size=2, feature_source="waveform",
                          seed=11)
    gen_i.raw_int16 = True
    xf, yf = next(gen_f.generate_train())
    xi, yi = next(gen_i.generate_train())
    assert xi.dtype == np.int16
    np.testing.assert_array_equal(yf, yi)
    np.testing.assert_array_equal(
        xf, xi.astype(np.float32) * np.float32(r.waveform.scale))


def test_train_step_wave_scale_decode(split_h5):
    """A step fed raw int16 + wave_scale computes the same loss as one fed
    the host-decoded float32 batch."""
    import jax.numpy as jnp

    from sound_event_detection_dcase2017_task4_tpu import train
    from sound_event_detection_dcase2017_task4_tpu.models import SedCnn
    from sound_event_detection_dcase2017_task4_tpu.ops.stft import (
        make_logmel_fn)

    path, cfg, _ = split_h5
    r = read_split(path, load_waveform=True)
    model = SedCnn(classes_num=17, channels=(8,), head="avg")
    frontend = make_logmel_fn(cfg, use_pallas=False)
    state, tx = train.create_train_state(model, cfg,
                                         example_frames=cfg.frames_num)
    idx = np.asarray([0, 1, 2, 3])
    y = jnp.asarray(r.target[idx])
    step_f = train.make_train_step(model, tx, frontend=frontend,
                                   donate_state=False)
    step_i = train.make_train_step(model, tx, frontend=frontend,
                                   donate_state=False,
                                   wave_scale=r.waveform.scale)
    _, mf = step_f(state, jnp.asarray(r.waveform[idx]), y)
    _, mi = step_i(state, jnp.asarray(r.waveform.raw[idx]), y)
    np.testing.assert_allclose(float(mf["loss"]), float(mi["loss"]),
                               rtol=1e-6)


def test_pad_or_truncate():
    x = np.ones(5, np.float32)
    assert pad_or_truncate(x, 3).shape == (3,)
    out = pad_or_truncate(x, 8)
    assert out.shape == (8,)
    assert out[5:].sum() == 0


def test_prefetch_to_device(split_h5):
    path, _, _ = split_h5
    r = read_split(path)
    gen = DataGenerator(r, validate=r, batch_size=4)
    items = list(prefetch_to_device(gen.generate_validate("validate")))
    assert len(items) == 3
    assert items[0][0].shape[0] == 4


def test_prefetch_propagates_producer_exception():
    """A producer-thread crash must crash the consumer, not end the stream
    cleanly (ADVICE.md round 1: a data-pipeline failure masqueraded as
    successful completion)."""

    def broken():
        yield (np.zeros((2, 4), np.float32), np.zeros((2, 17), np.float32))
        raise OSError("simulated HDF5 read failure")

    it = prefetch_to_device(broken())
    next(it)
    with pytest.raises(RuntimeError, match="prefetch producer"):
        for _ in it:
            pass


def test_generator_state_dict_resume(split_h5):
    """load_state_dict(state_dict()) continues the exact batch stream."""
    path, _, _ = split_h5
    r = read_split(path)
    g = DataGenerator(r, batch_size=4, seed=3)
    it = g.generate_train()
    for _ in range(7):
        next(it)
    snap = g.state_dict()
    expect = [next(it) for _ in range(5)]

    g2 = DataGenerator(r, batch_size=4, seed=999)   # different seed
    g2.load_state_dict(snap)
    it2 = g2.generate_train()
    for (xa, ya), (xb, yb) in zip(expect, (next(it2) for _ in range(5))):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_holdout_indices_partition():
    tr, ho = holdout_indices(10, fold=2, n_folds=4)
    assert sorted(np.concatenate([tr, ho]).tolist()) == list(range(10))
    assert set(ho.tolist()) == {1, 5, 9}            # i % 4 == 1 (fold 2)
    with pytest.raises(ValueError):
        holdout_indices(10, fold=5, n_folds=4)


def test_subset_reader_views(split_h5):
    path, cfg, _ = split_h5
    mem = read_split(path, load_waveform=True, in_memory=True)
    lazy = read_split(path, load_waveform=True, in_memory=False)
    idx = np.array([0, 3, 4, 8])
    sub_m = subset_reader(mem, idx)
    sub_l = subset_reader(lazy, idx)
    assert len(sub_m) == len(sub_l) == 4
    assert sub_m.audio_names == [mem.audio_names[i] for i in idx]
    take = np.array([1, 3])                          # sorted sub-index
    np.testing.assert_array_equal(sub_m.feature[take],
                                  mem.feature[idx[take]])
    np.testing.assert_array_equal(sub_l.feature[take],
                                  mem.feature[idx[take]])
    np.testing.assert_array_equal(sub_l.waveform[take],
                                  mem.waveform[idx[take]])
    # the subset works as a DataGenerator source
    gen = DataGenerator(sub_l, batch_size=2)
    x, y = next(gen.generate_train())
    assert x.shape[0] == 2 and y.shape == (2, 17)
    lazy.close()


def test_subset_reader_keeps_int16_transport(split_h5):
    """A --holdout_fold subset must preserve the quantized-waveform
    transport contract (`.scale`/`.raw`): the wrapper order is
    scale-OUTSIDE-index, so the raw-int16 host path and the device bank
    staging still see undecoded rows (the reverse order silently degraded
    every holdout run to f32 transport — 2× bytes both ways)."""
    path, cfg, _ = split_h5
    mem = read_split(path, load_waveform=True, in_memory=True)
    idx = np.array([1, 2, 6])
    sub = subset_reader(mem, idx)
    if not hasattr(mem.waveform, "scale"):
        pytest.skip("corpus not quantized")
    assert sub.waveform.scale == mem.waveform.scale
    raw = sub.waveform.raw[np.arange(3)]
    assert raw.dtype == np.int16
    np.testing.assert_array_equal(raw, mem.waveform.raw[idx])
    # decode via the subset equals decode-then-index
    np.testing.assert_array_equal(sub.waveform[np.arange(3)],
                                  mem.waveform[idx])
    mem.close()


class TestHardProfile:
    """The discriminative corpus (data/synth.py --profile hard)."""

    def test_structure_and_determinism(self):
        import numpy as np

        from sound_event_detection_dcase2017_task4_tpu.config import DEFAULT
        from sound_event_detection_dcase2017_task4_tpu.data.synth import (
            make_synthetic_dataset)

        a = make_synthetic_dataset(30, DEFAULT, seed=3, profile="hard")
        b = make_synthetic_dataset(30, DEFAULT, seed=3, profile="hard")
        assert all(np.array_equal(x.waveform, y.waveform)
                   for x, y in zip(a, b))
        assert a[0].audio_name.startswith("hard_")
        waves = np.stack([c.waveform for c in a])
        assert np.isfinite(waves).all() and np.abs(waves).max() <= 1.0
        # weak targets consistent with strong events
        for c in a:
            from sound_event_detection_dcase2017_task4_tpu.config import (
                lb_to_idx)

            active = {lb_to_idx[e[2]] for e in c.events}
            assert set(np.flatnonzero(c.weak_target)) == active
        # some clips are background-only (the ~10% negatives)
        assert any(len(c.events) == 0 for c in a)
        # events overlap somewhere in the corpus (the point of "hard")
        def overlaps(evs):
            evs = sorted(evs)
            return any(evs[i][1] > evs[i + 1][0]
                       for i in range(len(evs) - 1))
        assert any(overlaps(c.events) for c in a if len(c.events) > 1)

    def test_easy_profile_untouched(self):
        """The easy profile is the golden-test substrate — byte-stable."""
        import numpy as np

        from sound_event_detection_dcase2017_task4_tpu.config import Config
        from sound_event_detection_dcase2017_task4_tpu.data.synth import (
            make_synthetic_dataset)

        cfg = Config(clip_samples=32000)
        clips = make_synthetic_dataset(2, cfg, seed=123)
        assert clips[0].audio_name == "synth_00000.wav"
        # fingerprint a few samples against the long-standing stream
        w = clips[0].waveform
        assert w.shape == (32000,) and np.isfinite(w).all()

    def test_unknown_profile_rejected(self):
        import pytest

        from sound_event_detection_dcase2017_task4_tpu.data.synth import (
            make_synthetic_dataset)

        with pytest.raises(ValueError, match="profile"):
            make_synthetic_dataset(2, profile="medium")


def test_int16_waveform_roundtrip(split_h5):
    """Round-4 verdict item 5: waveforms store as int16 + scale attr by
    default; readers decode to float32 transparently with |err| bounded by
    half a quantization step, and exactly for 16-bit-grid sources."""
    import h5py

    path, cfg, clips = split_h5
    with h5py.File(path, "r") as hf:
        assert hf["waveform"].dtype == np.int16
        assert hf["waveform"].attrs["scale"] == pytest.approx(1.0 / 32768)
    r = read_split(path, load_waveform=True)
    dec = r.waveform[np.array([0, 3])]
    assert dec.dtype == np.float32
    orig = np.stack([pad_or_truncate(clips[i].waveform, cfg.clip_samples)
                     for i in (0, 3)])
    # 0.5 steps from rounding; full-scale samples (synthetic clips touch
    # ±1.0) clip to 32767, the standard PCM mapping, costing one step
    assert np.abs(dec - np.clip(orig, -1.0, 32767 / 32768)).max() \
        <= 0.5 / 32768 + 1e-9


def test_int16_waveform_exact_for_16bit_grid_sources(tmp_path):
    """Floats that came from 16-bit PCM (the DCASE case) round-trip
    bit-exactly through int16 storage."""
    cfg = Config(clip_samples=4000)
    rng = np.random.RandomState(7)
    grid = (rng.randint(-32768, 32768, (3, cfg.clip_samples))
            .astype(np.float32) / 32768.0)
    path = str(tmp_path / "grid.h5")
    pack_waveforms_to_hdf5(iter(grid), [f"g{i}.wav" for i in range(3)],
                           np.zeros((3, 17), np.float32), path, cfg,
                           batch_size=2)
    r = read_split(path, load_waveform=True)
    np.testing.assert_array_equal(r.waveform[np.arange(3)], grid)


def test_float32_waveform_storage_still_supported(tmp_path):
    """waveform_dtype='float32' keeps the pre-round-5 storage (and old
    files without the scale attr read back unchanged)."""
    import h5py

    cfg = Config(clip_samples=4000)
    w = np.random.RandomState(3).randn(2, cfg.clip_samples).astype(
        np.float32) * 0.1
    path = str(tmp_path / "f32.h5")
    pack_waveforms_to_hdf5(iter(w), ["a.wav", "b.wav"],
                           np.zeros((2, 17), np.float32), path, cfg,
                           batch_size=2, waveform_dtype="float32")
    with h5py.File(path, "r") as hf:
        assert hf["waveform"].dtype == np.float32
        assert "scale" not in hf["waveform"].attrs
    r = read_split(path, load_waveform=True)
    np.testing.assert_array_equal(r.waveform[np.arange(2)], w)
