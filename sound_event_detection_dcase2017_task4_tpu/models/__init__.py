"""Model zoo (flax): CNN / gated-GLU / CRNN-BiGRU / CNN-Transformer SED models.

Reference surface: ``pytorch/models.py`` selected by ``--model_type``
(SURVEY.md §2). ``get_model(name)`` preserves the string-keyed registry.
"""

from .blocks import (AttBlock, ConvBlock, GLUBlock, interpolate,
                     pad_framewise_output)
from .zoo import MODEL_REGISTRY, SedCnn, get_model

__all__ = [
    "AttBlock", "ConvBlock", "GLUBlock", "interpolate",
    "pad_framewise_output", "MODEL_REGISTRY", "SedCnn", "get_model",
]
