"""Crash handling / debug (≙ reference core/debug.h + core/{win,linux}/debug.cpp).

Reference: callstack capture (StackTree), an unhandled-exception handler
installed at engine boot producing a crash report with the callstack + the
profiler stack (debug.cpp), debug-allocator guards, and
enableFloatingPointTraps.

TPU build: a sys.excepthook that writes a crash report (traceback + recent log
ring + profiler counters + device info), and FP traps via JAX's nan debugging
(jax_debug_nans — the closest analog: fail loudly at the op that produced the
NaN)."""
from __future__ import annotations

import datetime
import os
import sys
import traceback
from typing import Optional

from lumixengine_tpu.core import log, profiler

_installed = False
_report_dir = "."


def enable_floating_point_traps(on: bool = True) -> None:
    """≙ debug.h enableFloatingPointTraps — NaN-producing ops raise immediately."""
    import jax

    jax.config.update("jax_debug_nans", bool(on))


def write_crash_report(exc_type, exc, tb, path: Optional[str] = None) -> str:
    path = path or os.path.join(
        _report_dir, f"crash_{datetime.datetime.now():%Y%m%d_%H%M%S}.txt"
    )
    lines = ["=== lumixengine_tpu crash report ===", ""]
    lines += traceback.format_exception(exc_type, exc, tb)
    lines += ["", "--- recent log ---"]
    for t, lvl, system, msg in list(log.recent)[-64:]:
        lines.append(f"[{lvl}] {system}: {msg}")
    lines += ["", "--- profiler blocks (tail) ---"]
    for name, t0, t1, tid in profiler.blocks()[-32:]:
        lines.append(f"{name}: {(t1 - t0) * 1e3:.2f} ms")
    try:
        import jax

        lines += ["", f"backend: {jax.default_backend()}",
                  f"devices: {jax.devices()}"]
    except Exception:
        pass
    with open(path, "w") as f:
        f.write("\n".join(str(x) for x in lines))
    return path


def install_crash_handler(report_dir: str = ".") -> None:
    """≙ engine.cpp installing the unhandled-exception handler at boot."""
    global _installed, _report_dir
    _report_dir = report_dir
    if _installed:
        return
    _installed = True
    prev = sys.excepthook

    def hook(exc_type, exc, tb):
        try:
            path = write_crash_report(exc_type, exc, tb)
            log.log_error("crash", f"crash report written to {path}")
        finally:
            prev(exc_type, exc, tb)

    sys.excepthook = hook
