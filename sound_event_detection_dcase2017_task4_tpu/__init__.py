"""sedx — TPU-native sound event detection framework (DCASE 2017 Task 4).

Brand-new JAX/XLA/Pallas re-design with the capabilities of the reference
PyTorch pipeline ``qiuqiangkong/sound_event_detection_dcase2017_task4``
(see SURVEY.md for the full blueprint and reference-symbol citations).

Import convention::

    import sound_event_detection_dcase2017_task4_tpu as sedx
"""

from . import config

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level API so `import ..._tpu as sedx` stays light (jax/flax
    # are only pulled in when the compute surface is touched).
    import importlib

    lazy = {
        "get_model": ("models", "get_model"),
        "MODEL_REGISTRY": ("models", "MODEL_REGISTRY"),
        "Config": ("config", "Config"),
        "Predictor": ("serving", "Predictor"),
        "StreamingDetector": ("serving", "StreamingDetector"),
        "make_logmel_fn": ("ops.stft", "make_logmel_fn"),
    }
    module_level = {"train", "sed", "sed_fast", "scoring", "evaluate",
                    "autoth", "data", "models", "parallel", "checkpoints",
                    "losses", "serving", "audio_io", "native"}
    if name in lazy:
        mod, attr = lazy[name]
        return getattr(importlib.import_module(f".{mod}", __name__), attr)
    if name in module_level:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
