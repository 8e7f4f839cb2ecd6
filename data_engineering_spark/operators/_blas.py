"""Single-threaded BLAS scope for driver-side numpy loops.

Driver-side training (the PQ/IVF k-means over a bounded sample) runs
tiny GEMMs — (sample x dsub) matrices of a few thousand rows. numpy's
bundled OpenBLAS defaults its pool to every host core, and on small
inputs the per-call thread fan-out/sync overhead dominates the math by
an order of magnitude; worse, when Spark executors are busy the BLAS
pool contends with task threads and the "fast driver step" becomes a
multi-second stall (measured: pq_train_sample 5.5 s contended / 0.64 s
idle at 32 BLAS threads vs 0.30 s at 1 thread, bit-identical output —
threading only changes GEMM work partitioning, never an output
element's accumulation order).

Executor-side Python workers are NOT affected (PySpark already pins
OMP_NUM_THREADS to the task's core count in workers); this scope is
for the driver process, where env vars are too late once numpy has
loaded BLAS.
"""

from __future__ import annotations

import contextlib
import ctypes
import re
import threading

_LIB = None  # (set_fn, get_fn) once resolved; False = unavailable

# the BLAS pool size is PROCESS-global: concurrent scopes (e.g. the
# IVF and PQ trainings overlapped from two driver threads) must not
# race the save/restore — the first scope in pins 1, the last one out
# restores the original, nested/overlapping entries just ride along
_GUARD = threading.Lock()
_DEPTH = 0
_PREV: int | None = None


def _resolve():
    """Locate the ALREADY-LOADED OpenBLAS (numpy's bundled copy) via
    the process map and bind its thread-control symbols. CDLL on a
    loaded path only bumps the refcount — no second copy."""
    global _LIB
    if _LIB is not None:
        return _LIB
    try:
        path = None
        with open("/proc/self/maps") as fh:
            for line in fh:
                m = re.search(r"(/\S+openblas\S+\.so[\w.]*)", line)
                if m:
                    path = m.group(1)
                    break
        if path is None:
            _LIB = False
            return _LIB
        lib = ctypes.CDLL(path)
        for suf in ("64_", "_64", ""):
            try:
                setf = getattr(lib, f"openblas_set_num_threads{suf}")
                getf = getattr(lib, f"openblas_get_num_threads{suf}")
                _LIB = (setf, getf)
                return _LIB
            except AttributeError:
                continue
        _LIB = False
    except Exception:
        _LIB = False
    return _LIB


@contextlib.contextmanager
def single_thread_blas():
    """Pin the process BLAS pool to one thread for the scope, restoring
    the previous setting after the OUTERMOST scope exits (reentrant and
    thread-safe — overlapping driver-side trainings share the pin
    without racing the restore). No-op when OpenBLAS isn't resolvable
    (other BLAS builds keep their defaults — correctness is unaffected
    either way; this is purely a driver-latency control)."""
    lib = _resolve()
    if not lib:
        yield
        return
    setf, getf = lib
    global _DEPTH, _PREV
    with _GUARD:
        if _DEPTH == 0:
            _PREV = getf()
            setf(1)
        _DEPTH += 1
    try:
        yield
    finally:
        with _GUARD:
            _DEPTH -= 1
            if _DEPTH == 0 and _PREV is not None:
                setf(_PREV)
