"""Serving predictor: one-round-trip waveform → probs + events."""

import numpy as np
import pytest

from sound_event_detection_dcase2017_task4_tpu import serving, train
from sound_event_detection_dcase2017_task4_tpu.config import Config
from sound_event_detection_dcase2017_task4_tpu.models import SedCnn


@pytest.fixture(scope="module")
def predictor():
    cfg = Config(clip_samples=16000)
    model = SedCnn(classes_num=17, channels=(8, 16), head="att")
    state, _ = train.create_train_state(model, cfg)
    return serving.Predictor(
        model, state, cfg, use_pallas=False,
        sed_params={"sed_high_threshold": 0.4, "sed_low_threshold": 0.2,
                    "n_smooth": 5, "n_salt": 5})


def test_predict_shapes(predictor):
    wave = np.random.RandomState(0).randn(3, 16000).astype(np.float32) * 0.1
    out = predictor(wave)
    assert out["clipwise_output"].shape == (3, 17)
    assert out["framewise_output"].shape == (3, 51, 17)
    assert out["event_activity"].shape == (3, 51, 17)
    assert out["event_activity"].dtype == np.uint8


def test_detect_events_matches_host_decode(predictor):
    wave = np.random.RandomState(1).randn(2, 16000).astype(np.float32) * 0.1
    out = predictor(wave)
    events = predictor.detect_events(wave)
    assert len(events) == 2
    # host-side reference decode on the same framewise probs must agree
    from sound_event_detection_dcase2017_task4_tpu import sed

    ref_events = sed.frame_prediction_to_event_prediction(
        out["framewise_output"], predictor.sed_params,
        predictor.cfg.frames_per_second, predictor.labels)
    assert events == ref_events


def test_from_workspace_missing_checkpoint(tmp_path):
    with pytest.raises(FileNotFoundError):
        serving.Predictor.from_workspace(
            str(tmp_path), "Cnn_9layers_AttPooling",
            "loss_type=clip_bce/augmentation=none/batch_size=32")


class TestPredictLong:
    """Sliding-window inference over one arbitrary-length recording
    (Predictor.predict_long / detect_events_long)."""

    def test_single_window_matches_plain_predict(self, predictor):
        cfg = predictor.cfg
        rng = np.random.RandomState(0)
        x = (rng.randn(cfg.clip_samples) * 0.1).astype(np.float32)
        long_out = predictor.predict_long(x)
        plain = predictor(x[None])
        frames = long_out["framewise_output"].shape[0]
        np.testing.assert_allclose(
            long_out["framewise_output"],
            plain["framewise_output"][0, :frames], atol=1e-6)

    def test_stitched_timeline_and_absolute_times(self, predictor):
        cfg = predictor.cfg
        rng = np.random.RandomState(1)
        seconds = 2.6 * cfg.clip_samples / cfg.sample_rate
        n = int(seconds * cfg.sample_rate)
        x = (rng.randn(n) * 0.1).astype(np.float32)
        out = predictor.predict_long(x)
        assert out["framewise_output"].shape == (1 + n // cfg.hop_size, 17)
        assert np.isfinite(out["framewise_output"]).all()
        # probabilities: in [0, 1] after overlap averaging
        assert out["framewise_output"].min() >= 0.0
        assert out["framewise_output"].max() <= 1.0
        for onset, offset, label in out["events"]:
            assert 0.0 <= onset < offset <= seconds + 1.0 / cfg.frames_per_second
            assert isinstance(label, str)

    def test_shorter_than_one_window(self, predictor):
        cfg = predictor.cfg
        x = np.zeros(cfg.clip_samples // 3, np.float32)
        out = predictor.predict_long(x)
        assert out["framewise_output"].shape[0] == 1 + len(x) // cfg.hop_size

    def test_overlap_averaging_is_translation_consistent(self, predictor):
        """A window-aligned hop must reproduce each window's own framewise
        output outside overlap regions (stitching uses absolute frames)."""
        cfg = predictor.cfg
        rng = np.random.RandomState(2)
        x = (rng.randn(2 * cfg.clip_samples) * 0.1).astype(np.float32)
        # hop == window: no overlap at all → exact concatenation
        out = predictor.predict_long(
            x, hop_seconds=cfg.clip_samples / cfg.sample_rate)
        plain = predictor(np.stack([x[: cfg.clip_samples],
                                    x[cfg.clip_samples :]]))
        w_frames = cfg.frames_num
        np.testing.assert_allclose(
            out["framewise_output"][: w_frames - 1],
            plain["framewise_output"][0, : w_frames - 1], atol=1e-6)


def test_from_workspace_loads_tuned_sed_params(tmp_path):
    """from_workspace must pick up optimize_sed_thresholds' pickled params
    (per-class threshold arrays) and decode with them."""
    import os
    import pickle

    import h5py

    from sound_event_detection_dcase2017_task4_tpu import checkpoints

    cfg = Config(clip_samples=16000)
    model = SedCnn(classes_num=17, channels=(8, 16), head="att")
    state, _ = train.create_train_state(model, cfg)

    model_type, run_config = "TinyTest", "loss_type=clip_bce/batch_size=8"
    ws = str(tmp_path)
    ckpt_dir = os.path.join(ws, "checkpoints", "main",
                            f"model_type={model_type}", run_config)
    os.makedirs(ckpt_dir)
    checkpoints.save_checkpoint(ckpt_dir, state, 7)
    os.makedirs(os.path.join(ws, "scalars"))
    with h5py.File(os.path.join(ws, "scalars", "training.h5"), "w") as hf:
        hf["mean"] = np.zeros(cfg.mel_bins, np.float32)
        hf["std"] = np.ones(cfg.mel_bins, np.float32)
    opt_dir = os.path.join(ws, "opt_thresholds", "main",
                           f"model_type={model_type}", run_config)
    os.makedirs(opt_dir)
    tuned = {"sed_high_threshold": np.linspace(0.3, 0.7, 17),
             "sed_low_threshold": np.linspace(0.15, 0.35, 17),
             "n_smooth": 5, "n_salt": 3}
    with open(os.path.join(opt_dir, "sed.pickle"), "wb") as f:
        pickle.dump({"sed_params": tuned, "score": 0.9}, f)

    import sound_event_detection_dcase2017_task4_tpu.models as _m
    _m.MODEL_REGISTRY.setdefault("TinyTest",
                                 dict(channels=(8, 16), head="att"))
    try:
        pred = serving.Predictor.from_workspace(ws, model_type, run_config,
                                                cfg=cfg)
    finally:
        _m.MODEL_REGISTRY.pop("TinyTest", None)
    np.testing.assert_allclose(pred.sed_params["sed_high_threshold"],
                               tuned["sed_high_threshold"])
    assert pred.sed_params["n_salt"] == 3
    # per-class threshold arrays flow through the jitted on-device decode
    x = np.random.RandomState(0).randn(2, cfg.clip_samples).astype(np.float32)
    events = pred.detect_events(x)
    assert len(events) == 2


def test_predict_long_rejects_oversized_hop(predictor):
    """Hops longer than the model window leave spans no window covers —
    previously those frames silently decoded as all-zero probabilities
    (advisor round-2 medium finding)."""
    wave = np.random.RandomState(0).randn(48000).astype(np.float32)
    with pytest.raises(ValueError, match="exceeds the model window"):
        predictor.predict_long(wave, hop_seconds=2.0)   # window is 0.5 s
    # at exactly the window length every frame is covered → accepted
    out = predictor.predict_long(wave, hop_seconds=0.5)
    assert np.isfinite(out["framewise_output"]).all()


def test_from_workspace_pinned_iteration_skips_tuned_params(tmp_path,
                                                            caplog):
    """Tuned decode params belong to the LATEST checkpoint; pinning an
    older iteration must not silently mix model generations (advisor
    round-2 low finding)."""
    import logging
    import os
    import pickle

    import h5py

    from sound_event_detection_dcase2017_task4_tpu import checkpoints, sed

    cfg = Config(clip_samples=16000)
    model = SedCnn(classes_num=17, channels=(8, 16), head="att")
    state, _ = train.create_train_state(model, cfg)

    model_type, run_config = "TinyTest", "loss_type=clip_bce/batch_size=8"
    ws = str(tmp_path)
    ckpt_dir = os.path.join(ws, "checkpoints", "main",
                            f"model_type={model_type}", run_config)
    os.makedirs(ckpt_dir)
    checkpoints.save_checkpoint(ckpt_dir, state, 5)
    checkpoints.save_checkpoint(ckpt_dir, state, 9)
    os.makedirs(os.path.join(ws, "scalars"))
    with h5py.File(os.path.join(ws, "scalars", "training.h5"), "w") as hf:
        hf["mean"] = np.zeros(cfg.mel_bins, np.float32)
        hf["std"] = np.ones(cfg.mel_bins, np.float32)
    opt_dir = os.path.join(ws, "opt_thresholds", "main",
                           f"model_type={model_type}", run_config)
    os.makedirs(opt_dir)
    with open(os.path.join(opt_dir, "sed.pickle"), "wb") as f:
        pickle.dump({"sed_params": {"sed_high_threshold": 0.9,
                                    "sed_low_threshold": 0.8,
                                    "n_smooth": 2, "n_salt": 2},
                     "score": 0.9}, f)

    import sound_event_detection_dcase2017_task4_tpu.models as _m
    _m.MODEL_REGISTRY.setdefault("TinyTest",
                                 dict(channels=(8, 16), head="att"))
    try:
        with caplog.at_level(logging.WARNING,
                             logger="sound_event_detection_dcase2017_task4_tpu.serving"):
            pred = serving.Predictor.from_workspace(
                ws, model_type, run_config, cfg=cfg, iteration=5)
    finally:
        _m.MODEL_REGISTRY.pop("TinyTest", None)
    # defaults, not the tuned pickle
    assert pred.sed_params == dict(sed.sed_params_dict)
    assert any("NOT auto-loading" in r.message for r in caplog.records)


def test_from_workspace_iteration_best(tmp_path):
    """iteration='best' selects the highest-test-mAP eval iteration from
    the run's statistics (model selection, round 4)."""
    import os
    import pickle

    import h5py

    from sound_event_detection_dcase2017_task4_tpu import checkpoints

    cfg = Config(clip_samples=16000)
    model = SedCnn(classes_num=17, channels=(8, 16), head="att")
    model_type, run_config = "TinyBest", "loss_type=clip_bce/batch_size=8"
    ws = str(tmp_path)
    ckpt_dir = os.path.join(ws, "checkpoints", "main",
                            f"model_type={model_type}", run_config)
    os.makedirs(ckpt_dir)
    # three checkpoints with DIFFERENT params so the pick is observable
    states = {}
    for it, seed in ((0, 0), (5, 1), (10, 2)):
        st, _ = train.create_train_state(model, cfg, seed=seed)
        checkpoints.save_checkpoint(ckpt_dir, st, it)
        states[it] = st
    stats_dir = os.path.join(ws, "statistics", "main",
                             f"model_type={model_type}", run_config)
    os.makedirs(stats_dir)
    records = [
        {"iteration": 0, "data_type": "test", "at": {"mAP": 0.2}},
        {"iteration": 5, "data_type": "test", "at": {"mAP": 0.9}},  # best
        {"iteration": 5, "data_type": "train", "at": {"mAP": 0.99}},
        {"iteration": 10, "data_type": "test", "at": {"mAP": 0.6}},
    ]
    with open(os.path.join(stats_dir, "statistics.pickle"), "wb") as f:
        pickle.dump(records, f)
    os.makedirs(os.path.join(ws, "scalars"))
    with h5py.File(os.path.join(ws, "scalars", "training.h5"), "w") as hf:
        hf["mean"] = np.zeros(cfg.mel_bins, np.float32)
        hf["std"] = np.ones(cfg.mel_bins, np.float32)

    import sound_event_detection_dcase2017_task4_tpu.models as _m
    _m.MODEL_REGISTRY.setdefault("TinyBest",
                                 dict(channels=(8, 16), head="att"))
    try:
        pred = serving.Predictor.from_workspace(
            ws, model_type, run_config, cfg=cfg, iteration="best")
    finally:
        _m.MODEL_REGISTRY.pop("TinyBest", None)
    import jax

    want = np.asarray(
        jax.tree_util.tree_leaves(states[5].params)[0])
    got = np.asarray(jax.tree_util.tree_leaves(pred._state.params)[0])
    np.testing.assert_array_equal(got, want)      # iter 5 loaded, not 10


class TestStreamingDetector:
    """Live-stream chunked SED: early emissions must be decode-stable and
    feed()+flush() must equal predict_long on the same audio."""

    def _stream_events(self, predictor, x, chunks, hop_seconds):
        det = serving.StreamingDetector(predictor, hop_seconds=hop_seconds)
        emitted, early = [], []
        pos = 0
        for size in chunks:
            out = det.feed(x[pos : pos + size])
            emitted += out
            early += out
            pos += size
        if pos < len(x):
            emitted += det.feed(x[pos:])
        emitted += det.flush()
        return emitted, early

    @pytest.mark.parametrize("hop_seconds", [None, 0.25])
    def test_equals_predict_long(self, predictor, hop_seconds):
        rng = np.random.RandomState(0)
        n = int(2.7 * predictor.cfg.clip_samples)     # ~3 windows
        x = (rng.randn(n) * 0.1).astype(np.float32)
        # loud tones so some events exist
        t = np.arange(n) / predictor.cfg.sample_rate
        x += (3.0 * np.sin(2 * np.pi * 800 * t)
              * (np.sin(2 * np.pi * 0.7 * t) > 0.2))
        # the untrained fixture model's probs hover around 0.5, so with
        # the default low=0.2 almost no frame is sub-low and the per-class
        # stability cut (correctly) withholds everything until flush —
        # tighten the decode band so the EARLY-emission path is exercised
        saved = dict(predictor.sed_params)
        predictor.sed_params.update(
            sed_high_threshold=0.52, sed_low_threshold=0.46,
            n_smooth=3, n_salt=2)
        try:
            offline = predictor.predict_long(
                x, hop_seconds=hop_seconds)["events"]
            chunks = [1000, 7000, 333, 20000, 4096] * 50   # ragged feeds
            streamed, early = self._stream_events(
                predictor, x, chunks, hop_seconds)
        finally:
            predictor.sed_params.clear()
            predictor.sed_params.update(saved)
        assert sorted(streamed) == sorted(offline)
        # no duplicates across the stream's lifetime
        assert len(streamed) == len(set(streamed))
        # early emissions are a subset of the offline result verbatim,
        # and the early path genuinely fired
        assert set(early) <= set(offline)
        assert len(early) > 0
        assert len(offline) > len(early) >= 1

    def test_feed_after_flush_raises(self, predictor):
        det = serving.StreamingDetector(predictor)
        det.flush()
        with pytest.raises(RuntimeError, match="flushed"):
            det.feed(np.zeros(100, np.float32))
        assert det.flush() == []                  # idempotent

    def test_oversized_hop_rejected(self, predictor):
        with pytest.raises(ValueError, match="exceeds the model window"):
            serving.StreamingDetector(predictor, hop_seconds=99.0)


def test_streaming_buffer_stays_bounded(predictor):
    """Consumed audio must be dropped: the detector holds O(window)
    samples however long the stream runs (round-4 review finding)."""
    det = serving.StreamingDetector(predictor, hop_seconds=0.25)
    chunk = 4096
    for _ in range(40):                         # ~10 windows' worth
        det.feed(np.zeros(chunk, np.float32))
    assert len(det._buf) <= det.window + chunk
    assert det._base + len(det._buf) == det._total


def test_from_workspace_best_equals_latest_autoloads_tuned(tmp_path):
    """iteration='best' that resolves to the NEWEST checkpoint must apply
    the run's tuned SED params exactly like iteration=None would."""
    import os
    import pickle

    import h5py

    from sound_event_detection_dcase2017_task4_tpu import checkpoints

    cfg = Config(clip_samples=16000)
    model = SedCnn(classes_num=17, channels=(8, 16), head="att")
    state, _ = train.create_train_state(model, cfg)
    model_type, run_config = "TinyBL", "loss_type=clip_bce/batch_size=8"
    ws = str(tmp_path)
    ckpt_dir = os.path.join(ws, "checkpoints", "main",
                            f"model_type={model_type}", run_config)
    os.makedirs(ckpt_dir)
    checkpoints.save_checkpoint(ckpt_dir, state, 3)
    checkpoints.save_checkpoint(ckpt_dir, state, 9)   # latest == best below
    stats_dir = os.path.join(ws, "statistics", "main",
                             f"model_type={model_type}", run_config)
    os.makedirs(stats_dir)
    with open(os.path.join(stats_dir, "statistics.pickle"), "wb") as f:
        pickle.dump([
            {"iteration": 3, "data_type": "test", "at": {"mAP": 0.4}},
            {"iteration": 9, "data_type": "test", "at": {"mAP": 0.8}},
        ], f)
    os.makedirs(os.path.join(ws, "scalars"))
    with h5py.File(os.path.join(ws, "scalars", "training.h5"), "w") as hf:
        hf["mean"] = np.zeros(cfg.mel_bins, np.float32)
        hf["std"] = np.ones(cfg.mel_bins, np.float32)
    opt_dir = os.path.join(ws, "opt_thresholds", "main",
                           f"model_type={model_type}", run_config)
    os.makedirs(opt_dir)
    with open(os.path.join(opt_dir, "sed.pickle"), "wb") as f:
        pickle.dump({"sed_params": {"n_smooth": 7, "n_salt": 4},
                     "score": 0.9}, f)

    import sound_event_detection_dcase2017_task4_tpu.models as _m
    _m.MODEL_REGISTRY.setdefault("TinyBL",
                                 dict(channels=(8, 16), head="att"))
    try:
        pred = serving.Predictor.from_workspace(
            ws, model_type, run_config, cfg=cfg, iteration="best")
    finally:
        _m.MODEL_REGISTRY.pop("TinyBL", None)
    assert pred.sed_params["n_smooth"] == 7      # tuned params applied
    assert pred.sed_params["n_salt"] == 4


def test_streaming_timeline_compacts_and_stays_bounded(predictor):
    """Round-4 verdict item 7: the stitched probability timeline must be
    O(window + active stretch), not O(stream). With decode thresholds
    above the untrained model's ~0.5 prob level every settled frame is
    sub-low in all classes, so compaction can run at every drain — the
    accumulator must stay near one window long over a 30-window stream,
    and the emitted-key set must be pruned with the horizon."""
    saved = dict(predictor.sed_params)
    predictor.sed_params.update(
        sed_high_threshold=0.97, sed_low_threshold=0.93,
        n_smooth=3, n_salt=2)
    try:
        det = serving.StreamingDetector(predictor, hop_seconds=0.25)
        cfg = predictor.cfg
        frames_win = cfg.frames_num
        rng = np.random.RandomState(1)
        bound = 0
        for _ in range(60):                    # ~30 windows of audio
            det.feed((rng.randn(cfg.clip_samples // 2) * 0.05
                      ).astype(np.float32))
            bound = max(bound, det._acc.shape[0])
        # one window of frames + the unsettled tail (window - hop) + the
        # n_smooth+1 separator slack — NOT proportional to the 30 windows
        hop_frames = det.hop // cfg.hop_size
        assert bound <= 2 * frames_win + hop_frames + 8, bound
        assert det._f0 > 20 * frames_win       # the prefix really dropped
        assert len(det._emitted) < 50
        det.flush()
    finally:
        predictor.sed_params.clear()
        predictor.sed_params.update(saved)


def test_streaming_compaction_preserves_equality_on_long_stream(predictor):
    """Equality with predict_long must survive aggressive compaction:
    a ~8-window stream with loud bursts separated by quiet stretches
    (so separator blocks exist between events)."""
    cfg = predictor.cfg
    n = int(8.3 * cfg.clip_samples)
    rng = np.random.RandomState(2)
    x = (rng.randn(n) * 0.05).astype(np.float32)
    t = np.arange(n) / cfg.sample_rate
    burst = (np.sin(2 * np.pi * 0.11 * t) > 0.75)
    x += 3.0 * np.sin(2 * np.pi * 700 * t) * burst
    # band chosen against the untrained fixture model's output range: its
    # per-frame max class prob sits at ~0.89-0.99, so low=0.93 yields both
    # genuine events (seeds >= 0.97 exist) and all-class sub-low separator
    # blocks between them (median max ~0.93) — compaction must fire
    saved = dict(predictor.sed_params)
    predictor.sed_params.update(
        sed_high_threshold=0.97, sed_low_threshold=0.93,
        n_smooth=3, n_salt=2)
    try:
        offline = predictor.predict_long(x, hop_seconds=0.25)["events"]
        det = serving.StreamingDetector(predictor, hop_seconds=0.25)
        streamed = []
        pos, sizes, i = 0, [5000, 12000, 3333, 8192], 0
        compacted = False
        while pos < n:
            streamed += det.feed(x[pos : pos + sizes[i % 4]])
            pos += sizes[i % 4]
            i += 1
            compacted = compacted or det._f0 > 0
        streamed += det.flush()
    finally:
        predictor.sed_params.clear()
        predictor.sed_params.update(saved)
    assert compacted                           # the fast path was exercised
    assert len(offline) > 0                    # ...on a stream WITH events
    assert sorted(streamed) == sorted(offline)
    assert len(streamed) == len(set(streamed))
