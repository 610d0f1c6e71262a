"""Progress reporting — the reference's ``IReporter`` surface, Spark-shaped.

The reference threads an ``IReporter`` (lib/interfaces.py:11-31: on_message /
on_input / start_progress / on_progress / stop_progress) through ingest,
vectorize and evaluate so a CLI or Streamlit app can render progress.  In a
Spark engine per-TASK progress already lives in the Spark UI/event log; what
the reporter adds is STAGE-level narrative (which pipeline stage is running,
its row counters) — exactly the granularity ``run_pipeline`` checkpoints at.

``on_input`` exists for the reference's interactive CLI prompts; a batch
engine never blocks on input, so the base implementation returns the default
answer ("") rather than raising.
"""

from __future__ import annotations

import sys
import time


class IReporter:
    """Reporter interface (reference lib/interfaces.py:11-31)."""

    def on_message(self, *messages: str) -> None:  # pragma: no cover
        pass

    def on_input(self, message: str) -> str:  # pragma: no cover
        return ""

    def start_progress(self, total: int) -> None:  # pragma: no cover
        pass

    def on_progress(self, value: int) -> None:  # pragma: no cover
        pass

    def stop_progress(self) -> None:  # pragma: no cover
        pass


class NullReporter(IReporter):
    """Default: no output (the reference's quiet path)."""


class LoggingReporter(IReporter):
    """Stage narrative to a stream (stderr by default), with timing."""

    def __init__(self, stream=None):
        self.stream = stream or sys.stderr
        self.total = 0
        self._t0 = 0.0
        self.messages: list[str] = []  # introspectable (tests, notebooks)

    def on_message(self, *messages: str) -> None:
        text = " ".join(messages)
        self.messages.append(text)
        print(text, file=self.stream, flush=True)

    def start_progress(self, total: int) -> None:
        self.total = total
        self._t0 = time.time()

    def on_progress(self, value: int) -> None:
        elapsed = time.time() - self._t0
        self.on_message(f"[{value}/{self.total}] {elapsed:.1f}s elapsed")

    def stop_progress(self) -> None:
        self.on_message(f"done in {time.time() - self._t0:.1f}s")
