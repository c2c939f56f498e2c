"""C22 — buffered async logger (reference genesis/src/logger.rs:14-69).

The reference buffers timestamped lines in memory, flushes when the
buffer reaches ``buffer_size`` entries (logger.rs:55-58) and from a 5 s
background tick (main.rs:68-73), appending to
``logs/crawler-<name>.log`` where <name> is picked from a fixed name
table (logger.rs:8-12, random in the reference — seedable here so runs
are reproducible).

Driver-side component: Spark executors never log through this (their
output goes to task logs); the crawl engine uses it for the per-round
summaries the reference prints per batch.
"""

from __future__ import annotations

import hashlib
import os
import threading
import time
from datetime import datetime

#: logger.rs:8-12 (data, not code — file-name pool mirrored for parity)
LOG_NAMES = [
    "yuki", "sakura", "mikasa", "miku", "asuka", "rei", "misato", "hinata",
    "tohru", "zero", "rem", "ram", "emilia", "aqua", "nami", "lucy", "erza",
    "asuna", "misaka", "saber", "rin", "mai", "nezuko", "ichigo",
]


def log_file_name(seed: int | None = None) -> str:
    """crawler-<name>.log; seeded md5 pick replaces the reference's
    ``rng.random_range(0..len)`` so reruns land in the same file."""
    if seed is None:
        idx = int.from_bytes(os.urandom(2), "big") % len(LOG_NAMES)
    else:
        idx = int.from_bytes(
            hashlib.md5(str(seed).encode()).digest()[:2], "big"
        ) % len(LOG_NAMES)
    return f"crawler-{LOG_NAMES[idx]}.log"


class AsyncLogger:
    """Size- and interval-flushed append logger (logger.rs semantics:
    lines are ``[YYYY-mm-dd HH:MM:SS] msg``; flush concatenates the
    buffer in one write)."""

    def __init__(self, log_dir: str, buffer_size: int = 100,
                 flush_interval: float | None = 5.0,
                 seed: int | None = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, log_file_name(seed))
        self.buffer_size = buffer_size
        self._buf: list[str] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._fh = open(self.path, "a", encoding="utf-8")
        self._timer: threading.Thread | None = None
        if flush_interval:
            self._timer = threading.Thread(
                target=self._tick, args=(flush_interval,), daemon=True
            )
            self._timer.start()

    def _tick(self, interval: float) -> None:
        # main.rs:68-73 — the 5 s background flush task
        while not self._stop.wait(interval):
            self.flush()

    def add_entry(self, message: str) -> None:
        line = f"[{datetime.now():%Y-%m-%d %H:%M:%S}] {message}\n"
        with self._lock:
            if self._fh.closed:
                # entries after close() could never reach the file (the
                # flush guard skips a closed handle) — fail loudly
                # instead of buffering them into the void
                raise ValueError("add_entry() on a closed AsyncLogger")
            self._buf.append(line)
            if len(self._buf) >= self.buffer_size:
                self._flush_locked()

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if self._buf and not self._fh.closed:
            self._fh.write("".join(self._buf))
            self._fh.flush()
            self._buf.clear()

    def close(self) -> None:
        self._stop.set()
        if self._timer is not None:
            self._timer.join(timeout=1.0)
        self.flush()
        with self._lock:
            if not self._fh.closed:
                self._fh.close()

    def __enter__(self) -> "AsyncLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # test/ops hook
    def pending(self) -> int:
        with self._lock:
            return len(self._buf)
