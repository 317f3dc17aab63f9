"""Background-compile ("prewarm") thread registry.

Prewarm threads background-compile jitted executables so their first real
use doesn't stall the pipeline.  They are daemon threads (they must never
block a run from finishing), but a daemon thread still inside an XLA
compile when the interpreter finalizes crashes the C++ runtime
("terminate called recursively" at pytest exit).  Registering every
prewarm thread here lets an atexit hook join them -- compiles are short
relative to any real run, so the join is usually a no-op; the timeout
bounds pathological cases.
"""
from __future__ import annotations

import atexit
import threading
from typing import Callable, List

_threads: List[threading.Thread] = []
_lock = threading.Lock()


def start_prewarm(fn: Callable[[], None], name: str = "prewarm") -> threading.Thread:
    """Runs `fn` on a registered daemon thread; `fn` must be best-effort
    (swallow its own exceptions)."""
    t = threading.Thread(target=fn, daemon=True, name=name)
    with _lock:
        _threads.append(t)
    t.start()
    return t


@atexit.register
def _join_prewarm_threads() -> None:
    with _lock:
        pending = [t for t in _threads if t.is_alive()]
        _threads.clear()
    for t in pending:
        t.join(timeout=120.0)
