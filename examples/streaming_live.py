"""Live-stream SED demo: feed audio chunk-by-chunk, print events as they
become final.

Simulates a microphone loop by slicing a generated recording into ragged
chunks; in production, replace the loop body with your audio callback.
Events print the moment they are decode-stable — each exactly once, with
absolute timestamps, provably identical to what the offline
``predict_long`` path would produce on the same audio
(``tests/test_serving.py::TestStreamingDetector``).

Run (after training something — see examples/minimal_train.py or runme.sh):

    python examples/streaming_live.py --workspace=$WS \
        --model_type=Cnn_9layers_Gru_FrameAtt \
        --run_config="loss_type=clip_bce/augmentation=mixup/batch_size=32"
"""

import argparse

import numpy as np

import sound_event_detection_dcase2017_task4_tpu as sedx


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workspace", required=True)
    p.add_argument("--model_type", default="Cnn_9layers_Gru_FrameAtt")
    p.add_argument("--run_config",
                   default="loss_type=clip_bce/augmentation=mixup/"
                           "batch_size=32")
    p.add_argument("--seconds", type=float, default=30.0,
                   help="length of the simulated live recording")
    p.add_argument("--chunk_ms", type=int, default=250,
                   help="simulated audio-callback chunk size")
    args = p.parse_args()

    predictor = sedx.Predictor.from_workspace(
        args.workspace, args.model_type, args.run_config)
    detector = sedx.StreamingDetector(predictor)

    sr = predictor.cfg.sample_rate
    rng = np.random.RandomState(0)
    n = int(args.seconds * sr)
    t = np.arange(n) / sr
    # synthetic "live" audio: background noise + intermittent tones
    audio = (0.05 * rng.randn(n)
             + 0.5 * np.sin(2 * np.pi * 600 * t)
             * (np.sin(2 * np.pi * 0.23 * t) > 0.6)).astype(np.float32)

    chunk = int(sr * args.chunk_ms / 1000)
    for pos in range(0, n, chunk):
        for onset, offset, label in detector.feed(audio[pos : pos + chunk]):
            print(f"[live {pos / sr:6.2f}s] {onset:7.2f}-{offset:7.2f}s "
                  f"{label}")
    for onset, offset, label in detector.flush():
        print(f"[flush       ] {onset:7.2f}-{offset:7.2f}s {label}")


if __name__ == "__main__":
    main()
