"""Shared driver-side phase timing for the wave loop.

``timed(label)`` wraps every driver action in the wave (mega-agg, commit,
robots fetch, due checkpoint, ...). Two consumers:

- ``CRAWL_DEBUG_TIMING=1`` prints ``T <label> <sec>`` stamps (the manual
  profiling protocol in BENCH/PROFILE.md);
- when a sink dict is installed (``run_wave`` installs one per wave), each
  label's wall time is accumulated into it — the crawler publishes them as
  ``t_<label>`` keys in the per-wave metrics row, which ``bench.py``
  forwards into the bench JSON so every recorded crawl leg carries its own
  phase receipts (the round-3 robots_overhead_x regression was
  unattributable precisely because the driver bench kept no per-phase
  evidence; see VERDICT r03 "What's wrong" #1).

The cost is two ``time.time()`` calls and a dict update per driver action
(a handful per wave) — always on.
"""

from __future__ import annotations

import os
import threading
import time
from contextlib import contextmanager
from typing import Dict, Optional

_DEBUG = bool(os.environ.get("CRAWL_DEBUG_TIMING"))

# Per-THREAD sink (installed by WaveCrawler.run_wave for the duration of
# one wave; the async split-commit installs its own on the background
# thread). Thread-local, not module-global: the background finalize of
# wave N overlaps wave N+1's compute, and a shared global would credit
# wave N's commit/outcome-write + manifest time to wave N+1's receipts —
# exactly the attribution the receipts exist to make trustworthy.
_TL = threading.local()


def set_sink(sink: Optional[Dict[str, float]]) -> None:
    """Install (or clear, with None) this thread's phase sink."""
    _TL.sink = sink


@contextmanager
def timed(label: str):
    t = time.time()
    yield
    dt = time.time() - t
    if _DEBUG:
        print(f"T {label} {dt:.1f}s", flush=True)
    sink = getattr(_TL, "sink", None)
    if sink is not None:
        key = label.strip()
        sink[key] = sink.get(key, 0.0) + dt
