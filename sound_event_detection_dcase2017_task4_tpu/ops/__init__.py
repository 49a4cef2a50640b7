"""Device-side ops: log-mel frontend (XLA + Pallas), pooling/interp utilities."""

from . import dsp  # noqa: F401
