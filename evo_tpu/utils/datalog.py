"""Pub-sub metrics router.

Capability-parity re-implementation of the reference DataLog stack
(reference: evo/utils/datalog.py): named tables routed to registered handlers
with a "*" wildcard; `ignored()` lets callers skip expensive collection; and
`progress()` prints timestamped lines.  Rank-0 gating becomes
jax.process_index() == 0 gating (single-controller JAX runs one Python per
host; all device parallelism is inside the compiled step, so there is far
less to gate than in the reference's one-process-per-core MPI world).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from os.path import isfile
from time import strftime

from evo_tpu.utils.autotable import AutoTable


def _is_primary() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # pragma: no cover
        return True


class DataHandler(ABC):
    """Base class for DataLog sinks."""

    def register(self, tblname):
        pass

    @abstractmethod
    def append(self, tblname, value):
        ...

    def append_all(self, valdict):
        for key, val in valdict.items():
            self.append(key, val)

    def assign(self, tblname, value):
        raise NotImplementedError(f"{type(self).__name__} does not support assign")

    def remove(self, tblname):
        pass

    def close(self):
        pass


class StoreToH5(DataHandler):
    """Route tables into an HDF5 file via AutoTable."""

    default_autotbl = None

    def __init__(self, destination=None, warnings: bool = True):
        self.destination = destination
        if not _is_primary():
            return
        if isinstance(destination, AutoTable):
            self.autotbl = destination
        elif isinstance(destination, str):
            self.autotbl = AutoTable(destination, warnings=warnings)
        elif destination is None:
            if StoreToH5.default_autotbl is None:
                self.autotbl = AutoTable(warnings=warnings)
            else:
                self.autotbl = StoreToH5.default_autotbl
        else:
            raise TypeError("expects an AutoTable instance or a filename")
        if StoreToH5.default_autotbl is None:
            StoreToH5.default_autotbl = self.autotbl

    def __repr__(self):
        return f"StoreToH5 into file {self.destination}"

    def append(self, tblname, value):
        self.autotbl.append(tblname, value)

    def append_all(self, valdict):
        self.autotbl.append_all(valdict)

    def assign(self, tblname, value):
        self.autotbl.assign(tblname, value)

    def close(self):
        self.autotbl.close()


class StoreToTxt(DataHandler):
    """Plain-text `name = value` log lines."""

    def __init__(self, destination=None):
        if not _is_primary():
            return
        if isinstance(destination, str):
            self.txt_file = open(destination, "w")
        elif destination is None:
            if isfile("terminal.txt"):
                raise ValueError("terminal.txt already exists; pass a filename")
            self.txt_file = open("terminal.txt", "w")

    def append(self, tblname, value):
        self.txt_file.write(f"{tblname} = {value}\n")
        self.txt_file.flush()

    def close(self):
        self.txt_file.close()


class TextPrinter(DataHandler):
    """Print tables to stdout."""

    def append(self, tblname, value):
        if _is_primary():
            print(f"\t{tblname} = {value}")


class DataLog:
    """Routes appended values to every handler whose registered table name
    matches (exactly, or via the '*' wildcard)."""

    def __init__(self):
        self.policy = []  # ordered (tblname, handler) pairs
        self._cache = {}

    def _lookup(self, tblname):
        if tblname not in self._cache:
            self._cache[tblname] = [
                h for (t, h) in self.policy if t == tblname or t == "*"
            ]
        return self._cache[tblname]

    def progress(self, message, completed=None):
        if not _is_primary():
            return
        if completed is None:
            print(f"[{strftime('%H:%M:%S')}] {message}")
        else:
            totlen = 65 - len(message)
            bar = int(totlen * completed)
            print(f"[{strftime('%H:%M:%S')}] {message} "
                  f"[{'*' * bar}{'-' * (totlen - bar)}]")

    def append(self, tblname, value):
        if not _is_primary():
            return
        for h in self._lookup(tblname):
            h.append(tblname, value)

    def assign(self, tblname, value):
        if not _is_primary():
            return
        for h in self._lookup(tblname):
            h.assign(tblname, value)

    def append_all(self, valdict):
        if not _is_primary():
            return
        handlers = set()
        for tblname in valdict:
            handlers.update(self._lookup(tblname))
        for h in handlers:
            argdict = {t: v for t, v in valdict.items() if h in self._lookup(t)}
            h.append_all(argdict)

    def ignored(self, tblname) -> bool:
        """True if appending to `tblname` would reach no handler — callers
        can skip expensive metric collection (reference datalog.py:213-231)."""
        return self._lookup(tblname) == []

    def set_handler(self, tblname, handler_class, *args, **kwargs):
        if not _is_primary():
            return None
        if not issubclass(handler_class, DataHandler):
            raise TypeError("handler_class must be a DataHandler subclass")
        handler = handler_class(*args, **kwargs)
        handler.register(tblname)
        names = [tblname] if isinstance(tblname, str) else list(tblname)
        for t in names:
            self.policy.append((t, handler))
        self._cache = {}
        return handler

    def remove_handler(self, handler):
        if not _is_primary():
            return
        if not isinstance(handler, DataHandler):
            raise ValueError("expected a DataHandler")
        self.policy = [(t, h) for (t, h) in self.policy if h is not handler]
        handler.close()
        self._cache = {}

    def close(self):
        if not _is_primary():
            return
        for (_, handler) in self.policy:
            handler.close()
