"""sedx — TPU-native sound event detection framework (DCASE 2017 Task 4).

Brand-new JAX/XLA/Pallas re-design with the capabilities of the reference
PyTorch pipeline ``qiuqiangkong/sound_event_detection_dcase2017_task4``
(see SURVEY.md for the full blueprint and reference-symbol citations).

Import convention::

    import sound_event_detection_dcase2017_task4_tpu as sedx
"""

from . import config

__version__ = "0.1.0"
