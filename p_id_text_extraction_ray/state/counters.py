"""Drop counters: the engine's version of the reference's skip-and-log
filter semantics (SURVEY.md §2.2 — zero-size-crop skip
``cropping_Images.py:51-53``, empty-text drop ``text_recognition.py:174``,
empty-after-clean text spans).

A zero-CPU counter actor collects per-stage drop totals; stages fire one
async ``add`` per batch *only when something was dropped*, so the actor
sees a trickle, not per-row traffic. ``run_resumable`` snapshots the
totals into each wave's manifest records.
"""

from __future__ import annotations


def make_drop_counter():
    """Create the counter actor (requires an initialised Ray runtime)."""
    import ray

    @ray.remote(num_cpus=0)
    class DropCounter:
        def __init__(self):
            self.counts: dict[str, int] = {}

        def add(self, stage: str, n: int) -> None:
            self.counts[stage] = self.counts.get(stage, 0) + int(n)

        def totals(self) -> dict[str, int]:
            return dict(self.counts)

    return DropCounter.remote()


def record_drop(counter, stage: str, n: int) -> None:
    """Fire-and-forget increment; no-op without a counter or drops."""
    if counter is not None and n > 0:
        counter.add.remote(stage, n)


def counter_totals(counter) -> dict[str, int]:
    import ray
    return ray.get(counter.totals.remote()) if counter is not None else {}
