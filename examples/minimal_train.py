"""Minimal library-API example: train a SED model and decode events.

Runs self-contained on CPU or TPU in ~a minute (tiny synthetic data):

    python examples/minimal_train.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import sound_event_detection_dcase2017_task4_tpu as sedx  # noqa: E402


def main():
    cfg = sedx.Config(clip_samples=32000)           # 1 s clips for speed
    clips = sedx.data.make_synthetic_dataset(32, cfg, seed=0)
    waves = np.stack([c.waveform for c in clips])
    targets = np.stack([c.weak_target for c in clips])

    # model + fused frontend + one jitted train step
    model = sedx.get_model("Cnn_9layers_Gru_FrameAtt")
    frontend = sedx.make_logmel_fn(cfg)             # use_pallas=True on TPU
    state, tx = sedx.train.create_train_state(
        model, cfg, learning_rate=1e-3, example_frames=cfg.frames_num)
    step = sedx.train.make_train_step(model, tx, frontend=frontend,
                                      mixup_alpha=1.0)

    for i in range(30):
        state, metrics = step(state, waves, targets)
        if i % 10 == 0:
            print(f"step {i}: loss {float(metrics['loss']):.4f}")

    # inference → SED events
    eval_step = sedx.train.make_eval_step(model, frontend=frontend)
    out = eval_step(state, waves[:4])
    events = sedx.sed.frame_prediction_to_event_prediction(
        np.asarray(out["framewise_output"]),
        {"sed_high_threshold": 0.3, "sed_low_threshold": 0.15,
         "n_smooth": 10, "n_salt": 10})
    for i, evs in enumerate(events):
        print(f"clip {i}: {evs[:3]}")


if __name__ == "__main__":
    main()
