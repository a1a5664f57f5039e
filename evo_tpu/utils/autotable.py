"""Append-oriented HDF5 store.

Same capability as the reference's PyTables-based AutoTable
(reference: evo/utils/autotable.py — auto-created extendable array per key on
first append, compression, flush per append, `assign` = overwrite semantics),
re-implemented on h5py (PyTables is not available in this image and h5py is
the leaner dependency).
"""

from __future__ import annotations

from time import strftime
from typing import Optional

import numpy as np


class AutoTable:
    """HDF5 writer that creates one resizable dataset per table name.

    append(name, value): appends `value` as a new row of dataset `name`
    (created on first use with shape [0, *value.shape], gzip-compressed).
    assign(name, value): overwrites the dataset so it always holds exactly
    one row (the latest value).
    """

    def __init__(self, fname: Optional[str] = None, compression: str = "gzip",
                 warnings: bool = True):
        import h5py

        self.fname = fname or self._guess_fname()
        self.h5 = h5py.File(self.fname, "w")
        self.compression = compression
        self.warnings = warnings
        self._assigned = set()

    @staticmethod
    def _guess_fname() -> str:
        return strftime("autotable-%Y%m%d-%H%M%S.h5")

    def close(self):
        if self.h5 is not None:
            self.h5.close()
            self.h5 = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    @staticmethod
    def _to_array(value) -> np.ndarray:
        if isinstance(value, str):
            return np.asarray(value.encode())
        a = np.asarray(value)
        if a.dtype == object:
            raise TypeError("cannot store object arrays")
        return a

    def _create(self, name: str, row: np.ndarray):
        import h5py

        kwargs = {}
        if row.ndim > 0 or row.size > 1:
            kwargs["compression"] = self.compression
        if row.dtype.kind == "S" or row.dtype.kind == "U":
            dt = h5py.string_dtype()
            self.h5.create_dataset(name, shape=(0,), maxshape=(None,), dtype=dt)
        else:
            self.h5.create_dataset(
                name, shape=(0,) + row.shape, maxshape=(None,) + row.shape,
                dtype=row.dtype, **kwargs,
            )

    def append(self, name: str, value):
        row = self._to_array(value)
        if name not in self.h5:
            self._create(name, row)
        ds = self.h5[name]
        # validate BEFORE resizing: a resize-then-raise would leave a
        # phantom all-zero row that silently shifts row-to-epoch alignment
        if row.dtype.kind not in "SU" and ds.shape[1:] != row.shape:
            raise ValueError(
                f"shape mismatch appending to '{name}': "
                f"{row.shape} vs {ds.shape[1:]}"
            )
        n = ds.shape[0]
        ds.resize(n + 1, axis=0)
        if row.dtype.kind in "SU":
            ds[n] = row.item() if row.dtype.kind == "S" else str(row)
        else:
            ds[n] = row
        self.h5.flush()

    def append_all(self, valdict: dict):
        for k, v in valdict.items():
            self.append(k, v)

    def assign(self, name: str, value):
        """Overwrite semantics (reference autotable.py:133-173): the dataset
        always holds the latest value only."""
        row = self._to_array(value)
        if name in self.h5 and (name not in self._assigned
                                or self.h5[name].shape[1:] != row.shape):
            del self.h5[name]
        if name not in self.h5:
            self._create(name, row)
            self.h5[name].resize(1, axis=0)
        if row.dtype.kind in "SU":
            self.h5[name][0] = row.item() if row.dtype.kind == "S" else str(row)
        else:
            self.h5[name][0] = row
        self._assigned.add(name)
        self.h5.flush()
