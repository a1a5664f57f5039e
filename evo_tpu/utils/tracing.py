"""Host-side tracepoint log + device profiler hooks.

Capability parity with the reference's tracing module (reference:
evo/utils/tracing.py): opt-in per-process tracefile with relative
timestamps, `tracepoint(name)` markers, a `@traced` decorator emitting
func:begin/end, and `close()` archiving the trace files.

On TPU the interesting time is *inside* the compiled step, which host
tracepoints cannot see — `device_trace(logdir)` wraps jax.profiler for that,
and `annotate(name)` adds named XLA trace annotations visible in the
profile (the TPU analog of the reference's in-loop tracepoints).
"""

from __future__ import annotations

import contextlib
import functools
import os
import tarfile
import time
from typing import Optional

_tracefile = None
_t0 = 0.0
_path: Optional[str] = None


def _proc_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:  # pragma: no cover
        return 0


def set_tracefile(path: str = "trace-%04d.txt"):
    """Enable tracing; %d in `path` is replaced by the process index
    (the reference's per-rank file, tracing.py:89-109)."""
    global _tracefile, _t0, _path
    if "%" in path:
        path = path % _proc_index()
    _path = path
    _tracefile = open(path, "w")
    _t0 = time.perf_counter()
    _tracefile.write("# evo_tpu trace, host=%s process=%d\n"
                     % (os.uname().nodename, _proc_index()))


def tracepoint(name: str):
    """Timestamped marker (no-op unless set_tracefile was called)."""
    if _tracefile is not None:
        _tracefile.write("%.6f %s\n" % (time.perf_counter() - _t0, name))


def traced(fn):
    """Decorator emitting `<name>:begin` / `<name>:end` tracepoints
    (reference tracing.py:59-86)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        tracepoint(fn.__name__ + ":begin")
        try:
            return fn(*args, **kwargs)
        finally:
            tracepoint(fn.__name__ + ":end")

    return wrapper


def close(archive: Optional[str] = "traces.tgz"):
    """Flush and optionally tar the tracefile (reference tracing.py:112-144)."""
    global _tracefile
    if _tracefile is None:
        return
    _tracefile.close()
    _tracefile = None
    if archive and _path and os.path.exists(_path):
        # the archive is named .tgz, so it must actually be gzip-compressed;
        # tarfile cannot append to a compressed archive, so when several
        # processes add their rank files sequentially, merge by rewriting
        # (trace files are small). "r:*" also reads archives written by the
        # old uncompressed format.
        import io

        members = []
        if os.path.exists(archive):
            with tarfile.open(archive, "r:*") as old:
                for m in old.getmembers():
                    data = old.extractfile(m).read() if m.isfile() else None
                    members.append((m, data))
        with tarfile.open(archive, "w:gz") as tar:
            for m, data in members:
                tar.addfile(m, io.BytesIO(data) if data is not None else None)
            tar.add(_path)
        os.remove(_path)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device profile (XLA ops, HBM, MXU utilization) for the
    enclosed block; inspect with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in device profiles (jax named scope)."""
    import jax

    return jax.named_scope(name)
