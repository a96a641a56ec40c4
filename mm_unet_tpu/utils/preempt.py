"""Graceful-preemption handling for long training runs.

The reference has no fault tolerance beyond resume-from-checkpoint
(SURVEY.md §5: "crash recovery is purely resume-from-checkpoint"). On TPU,
preemption is routine (spot/maintenance events deliver SIGTERM with a grace
window), so the trainer registers a handler that flips a flag; the epoch
loop checks it at step boundaries, saves a `checkpoint` the resume path
already understands, and exits 0 — on restart `trainer.resume: true`
continues from the saved epoch.
"""

from __future__ import annotations

import signal


class GracefulShutdown:
    """Latches SIGTERM/SIGINT into a poll-able flag.

    First signal: request a clean shutdown (finish the current step, save,
    exit). Second SIGINT: restore the default handler so a user can still
    force-kill an unresponsive run.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self.requested = False
        self._signals = signals
        self._previous = {}

    def install(self) -> "GracefulShutdown":
        for sig in self._signals:
            self._previous[sig] = signal.signal(sig, self._handle)
        return self

    def _handle(self, signum, frame):
        if self.requested and signum == signal.SIGINT:
            signal.signal(signal.SIGINT, self._previous.get(signal.SIGINT))
            raise KeyboardInterrupt
        self.requested = True
        print(
            f"[preempt] received signal {signum}: finishing current step, "
            "saving checkpoint, exiting",
            flush=True,
        )

    def uninstall(self) -> None:
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()
