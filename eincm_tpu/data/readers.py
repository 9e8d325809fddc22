"""Thin file readers with context-manager protocol.

Reference: src/dataloaders/reader_utils/hdf5_file_reader.py:4-53,
numpy_file_reader.py:4-45, mvsec_utils/mvsec_reader.py:7-75.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np


class HDF5FileReader:
    """h5py-backed reader; datasets are materialized into numpy on read."""

    def __init__(self, path):
        self.path = Path(path)
        self.h5_file = None

    def open_file(self):
        import h5py  # optional dep, imported lazily

        try:
            import hdf5plugin  # noqa: F401  (compression codecs, if present)
        except ImportError:
            pass
        self.h5_file = h5py.File(self.path, "r")
        return self

    def close_file(self):
        if self.h5_file is not None:
            self.h5_file.close()
            self.h5_file = None

    def read_dataset(self, key: str) -> np.ndarray:
        assert self.h5_file is not None, "open the file first"
        return np.asarray(self.h5_file[key])

    def read_attr(self, key: str) -> Any:
        assert self.h5_file is not None, "open the file first"
        return self.h5_file[key][()]

    def __enter__(self):
        return self.open_file()

    def __exit__(self, *exc):
        self.close_file()


class NumpyFileReader:
    """np.load-backed reader for .npz/.npy files."""

    def __init__(self, path):
        self.path = Path(path)
        self.np_file = None

    def open_file(self):
        self.np_file = np.load(self.path, allow_pickle=True)
        return self

    def close_file(self):
        if self.np_file is not None and hasattr(self.np_file, "close"):
            self.np_file.close()
        self.np_file = None

    def read_array(self, key: str) -> np.ndarray:
        assert self.np_file is not None, "open the file first"
        if isinstance(self.np_file, np.ndarray):
            # a bare .npy holds exactly one unnamed array — the key only
            # selects members of an .npz archive (the reference's reader
            # crashes on this case, numpy_file_reader.py:31)
            return np.asarray(self.np_file)
        return np.asarray(self.np_file[key])

    def __enter__(self):
        return self.open_file()

    def __exit__(self, *exc):
        self.close_file()


class MVSECReader:
    """Dispatches to HDF5 or numpy readers on file extension
    (reference: mvsec_reader.py:7-75)."""

    def __init__(self, path):
        self.file_path = Path(path)
        ext = self.file_path.suffix.lower()
        if ext in (".hdf5", ".h5"):
            self._rdr = HDF5FileReader(self.file_path)
        elif ext in (".npz", ".npy"):
            self._rdr = NumpyFileReader(self.file_path)
        else:
            raise ValueError(f"unsupported MVSEC file type: {ext}")

    def open_file(self):
        self._rdr.open_file()
        return self

    def close_file(self):
        self._rdr.close_file()

    def read_h5_dataset(self, key):
        return self._rdr.read_dataset(key)

    def read_np_array(self, key):
        return self._rdr.read_array(key)

    def __enter__(self):
        return self.open_file()

    def __exit__(self, *exc):
        self.close_file()


def imread_gray(path) -> np.ndarray:
    """Load an image as uint8 grayscale (BT.601 luminance for RGB inputs,
    matching cv.IMREAD_GRAYSCALE). Shared by the DSEC and ECD loaders."""
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.ndim == 3:
        img = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        ).astype(np.uint8)
    return img
