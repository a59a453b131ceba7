"""Per-stage duration histograms — the engine analog of the reference's
OTel duration instrument (``data-quality-server/src/metrics.rs:22-25``
registers a histogram with explicit millisecond buckets;
``json_validation.rs:62-83`` records one observation per request around
each validation step).

Engine recast: stages observe per-BATCH durations (never per row), a
detached named collector actor aggregates log-bucketed histograms, and the
runner snapshots them into each partition's lineage row — so a 100-TB run
leaves a queryable per-stage timing distribution next to its data, at a
cost of one tiny actor call per batch.
"""

from __future__ import annotations

import time

#: histogram bucket upper bounds in milliseconds (log-spaced; the
#: reference uses an explicit-bucket OTel histogram the same way)
BUCKETS_MS = (1.0, 5.0, 10.0, 50.0, 100.0, 500.0, 1000.0, 5000.0, 30000.0)

COLLECTOR_NAME = "dqcr_stage_metrics"


def _new_hist() -> dict:
    return {"count": 0, "sum_s": 0.0, "buckets": [0] * (len(BUCKETS_MS) + 1)}


def _observe(h: dict, seconds: float) -> None:
    h["count"] += 1
    h["sum_s"] += seconds
    ms = seconds * 1e3
    for i, ub in enumerate(BUCKETS_MS):
        if ms <= ub:
            h["buckets"][i] += 1
            return
    h["buckets"][-1] += 1


class _Collector:
    """Aggregates (stage -> histogram); runs as a detached named actor."""

    def __init__(self) -> None:
        self._h: dict[str, dict] = {}

    def observe_many(self, obs: list[tuple[str, float]]) -> None:
        for stage, seconds in obs:
            _observe(self._h.setdefault(stage, _new_hist()), seconds)

    def snapshot(self, reset: bool = False) -> dict[str, dict]:
        out = {k: {"count": v["count"], "sum_s": round(v["sum_s"], 4),
                   "buckets": list(v["buckets"])}
               for k, v in self._h.items()}
        if reset:
            self._h = {}
        return out


_CACHED_HANDLE = None


def get_collector():
    """Get or create the named collector actor (idempotent across workers;
    handle cached per process)."""
    global _CACHED_HANDLE
    if _CACHED_HANDLE is None:
        import ray

        # NOT detached: the collector should die with the driver/job — a
        # detached actor would outlive the run and hold a slot forever
        _CACHED_HANDLE = ray.remote(num_cpus=0)(_Collector).options(
            name=COLLECTOR_NAME, get_if_exists=True
        ).remote()
    return _CACHED_HANDLE


class StageClock:
    """Per-worker buffer of (stage, seconds) observations.

    ``timed(stage)`` wraps a phase; ``flush()`` ships the buffer to the
    collector synchronously (one small actor call per batch — determinism
    over fire-and-forget, so a snapshot taken after the job sees every
    observation)."""

    def __init__(self, collector) -> None:
        self._c = collector
        self._buf: list[tuple[str, float]] = []

    def observe(self, stage: str, seconds: float) -> None:
        self._buf.append((stage, seconds))

    class _Timer:
        def __init__(self, clock, stage):
            self.clock, self.stage = clock, stage

        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            self.clock.observe(self.stage, time.perf_counter() - self.t0)
            return False

    def timed(self, stage: str) -> "_Timer":
        return self._Timer(self, stage)

    def flush(self) -> None:
        if self._buf:
            import ray

            ray.get(self._c.observe_many.remote(self._buf))
            self._buf = []


def snapshot_and_reset() -> dict[str, dict]:
    """Driver-side: read the collector's histograms and clear them.
    Returns {} when no collector exists (metrics disabled)."""
    import ray

    try:
        c = ray.get_actor(COLLECTOR_NAME)
    except ValueError:
        return {}
    return ray.get(c.snapshot.remote(reset=True))
