"""Append-oriented HDF5 store.

Same capability as the reference's PyTables-based AutoTable
(reference: evo/utils/autotable.py — auto-created extendable array per key on
first append, compression, flush per append, `assign` = overwrite semantics),
re-implemented on h5py (PyTables is not available in this image and h5py is
the leaner dependency).

Compression mirrors the reference's `tables.Filters(complevel=1,
complib="zlib", shuffle=True)` (reference autotable.py:264): gzip level 1
with the byte shuffle — measured ~1.5x faster per full-resolution image
append than h5py's default gzip level 4, at the same file size.

`async_writes=True` moves every HDF5 operation onto one dedicated writer
thread (h5py handles must not be shared across concurrently-writing
threads): `append`/`assign` validate synchronously (so shape errors still
raise at the call site), snapshot the value, and enqueue; `close()` drains
the queue before closing the file.  This takes the gzip cost of large
per-epoch appends (e.g. the image apps' `reco_img_*`, ~0.4 s each at full
resolution) off the training loop's critical path — the reference writes
synchronously, but its epochs are minutes, not milliseconds.  Worker
exceptions are re-raised on the next call or at `close()`.
"""

from __future__ import annotations

import queue
import threading
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
                 warnings: bool = True, async_writes: bool = False):
        import h5py

        self.fname = fname or self._guess_fname()
        self.h5 = h5py.File(self.fname, "w")
        self.compression = compression
        self.warnings = warnings
        self._assigned = set()
        # synchronous-validation cache: name -> (shape, is_string); lets the
        # async path raise shape mismatches at the append() call site
        self._shapes = {}
        self._q = None
        self._worker = None
        self._exc = None
        if async_writes:
            # bounded: back-pressure instead of unbounded buffering if the
            # writer falls behind
            self._q = queue.Queue(maxsize=16)
            self._worker = threading.Thread(target=self._drain, daemon=True)
            self._worker.start()

    @staticmethod
    def _guess_fname() -> str:
        return strftime("autotable-%Y%m%d-%H%M%S.h5")

    def close(self):
        if self._q is not None:
            self._q.put(None)
            self._worker.join()
            self._q = None
            self._worker = None
        if self.h5 is not None:
            self.h5.close()
            self.h5 = None
        self._raise_pending()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    # ---- async plumbing ----------------------------------------------------
    def _drain(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            op, name, row = item
            if self._exc is not None:
                continue  # keep consuming so producers never block forever
            try:
                if op == "append":
                    self._append_sync(name, row)
                else:
                    self._assign_sync(name, row)
            except Exception as e:  # pragma: no cover - surfaced by _raise
                self._exc = e

    def _raise_pending(self):
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    # ---- value handling ----------------------------------------------------
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
            # reference parity: Filters(complevel=1, complib="zlib",
            # shuffle=True) — reference autotable.py:264
            kwargs["compression"] = self.compression
            if self.compression == "gzip":
                kwargs["compression_opts"] = 1
                kwargs["shuffle"] = True
            if row.nbytes >= 4096:
                # One row per chunk.  h5py's auto-chunking spans MANY rows
                # along the append axis (e.g. (64, 21, 31, 1) for a full-res
                # [321, 481, 3] image row), so every append is a
                # read-modify-write of every gzip chunk holding up to 63
                # PAST rows — per-append cost starts ~10x higher and grows
                # as the chunks fill (measured 432 -> 513 ms over 100
                # appends; the full-res inpainting app crept +45 ms/epoch).
                # A (1, *row.shape) chunk appends in a flat ~44 ms.  Tiny
                # rows (scalars, small vectors) keep the auto chunk: the
                # rewritten chunk is a few KB and h5 per-chunk overhead
                # would dominate one-row chunks.
                kwargs["chunks"] = (1,) + row.shape
        if row.dtype.kind == "S" or row.dtype.kind == "U":
            dt = h5py.string_dtype()
            self.h5.create_dataset(name, shape=(0,), maxshape=(None,), dtype=dt)
        else:
            self.h5.create_dataset(
                name, shape=(0,) + row.shape, maxshape=(None,) + row.shape,
                dtype=row.dtype, **kwargs,
            )

    # ---- public API ----------------------------------------------------------
    def append(self, name: str, value):
        self._raise_pending()
        row = self._to_array(value)
        if self._q is None:
            return self._append_sync(name, row)
        # validate at the call site (the worker would raise asynchronously)
        known = self._shapes.get(name)
        if known is not None:
            shape, is_str = known
            if not is_str and shape != row.shape:
                raise ValueError(
                    f"shape mismatch appending to '{name}': "
                    f"{row.shape} vs {shape}"
                )
        else:
            self._shapes[name] = (row.shape, row.dtype.kind in "SU")
        self._q.put(("append", name, np.array(row, copy=True)))

    def _append_sync(self, name: str, row: np.ndarray):
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
        self._raise_pending()
        row = self._to_array(value)
        if self._q is None:
            return self._assign_sync(name, row)
        self._shapes[name] = (row.shape, row.dtype.kind in "SU")
        self._q.put(("assign", name, np.array(row, copy=True)))

    def _assign_sync(self, name: str, row: np.ndarray):
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
