"""Training hang detection (fairseq DistributedTimeoutWrapper equivalent,
fairseq/distributed/distributed_timeout_wrapper.py:17-82): a heartbeat thread
that fires if no step completes within a timeout — on TPU pods a single hung
host stalls the whole collective, so surfacing the hang beats waiting forever.

Unlike the reference (which SIGKILLs the process), the default action logs a
loud message with the last-completed step and sets `.fired` for the caller to
poll; killing the process (SIGKILL like the reference) is opt-in via
kill=True. No exception is raised into the main thread — a hung collective
would never surface it."""

from __future__ import annotations

import os
import signal
import threading
import time
from typing import Optional


class Watchdog:
    def __init__(self, timeout_s: float = 600.0, kill: bool = False, name: str = "train"):
        self.timeout_s = timeout_s
        self.kill = kill
        self.name = name
        self._last_beat = time.monotonic()
        self._last_step: Optional[int] = None
        self._stop = threading.Event()
        self._fired = False
        self._thread: Optional[threading.Thread] = None

    def beat(self, step: Optional[int] = None) -> None:
        """Call once per completed train step."""
        self._last_beat = time.monotonic()
        self._last_step = step

    def _run(self):
        while not self._stop.wait(min(self.timeout_s / 4, 30.0)):
            idle = time.monotonic() - self._last_beat
            if idle > self.timeout_s:
                self._fired = True
                msg = (f"[watchdog] {self.name}: no heartbeat for {idle:.0f}s "
                       f"(last step {self._last_step}); possible hang")
                print(msg, flush=True)
                if self.kill:
                    os.kill(os.getpid(), signal.SIGTERM)
                self._last_beat = time.monotonic()  # avoid repeat-firing every poll

    def __enter__(self):
        self._thread = threading.Thread(target=self._run, daemon=True, name=f"watchdog-{self.name}")
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        return False

    @property
    def fired(self) -> bool:
        return self._fired
