"""Data layer: HDF5 pack/read (reference contract), batch generation with
device prefetch, synthetic corpus for tests/benchmarks."""

from .generator import DataGenerator, prefetch_to_device
from .hdf5 import (SplitReader, calculate_scalar, holdout_indices,
                   load_scalar, pack_waveforms_to_hdf5, pad_or_truncate,
                   read_split, scale, subset_reader)
from .synth import SynthClip, make_synthetic_dataset

__all__ = [
    "DataGenerator", "prefetch_to_device", "SplitReader", "calculate_scalar",
    "holdout_indices", "load_scalar", "pack_waveforms_to_hdf5",
    "pad_or_truncate", "read_split", "scale", "subset_reader", "SynthClip",
    "make_synthetic_dataset",
]
