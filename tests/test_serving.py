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
