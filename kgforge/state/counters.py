"""Distributed lineage counters for cap-degradation events.

The bounded-degradation paths (``ops/dedup.py`` star-edge caps,
``ops/ann.py`` bucket caps) previously reported truncation only via
stderr prints inside Ray workers — invisible to a job operator reading
the manifest of a 100 TB run. This module gives them a shared named
counter actor: worker-side code calls :func:`inc` (a few calls per
*degradation event*, never per row — zero cost on healthy data), and
the driver embeds :func:`snapshot` into job totals / manifests so
truncation rates are first-class output.

The actor is ``num_cpus=0`` (never occupies a slot Ray Data needs) and
is created lazily on first increment; ``snapshot()`` returns ``{}``
when nothing ever degraded. ``inc`` is synchronous (``ray.get``) so a
counter is durable before the incrementing task completes — acceptable
because increments are rare by construction.
"""

from __future__ import annotations

import ray

_NAME = "kgforge_lineage_counters"
_NS = "kgforge"


@ray.remote(num_cpus=0)
class _CounterActor:
    def __init__(self):
        self._c: dict[str, int] = {}

    def inc(self, name: str, n: int = 1) -> int:
        self._c[name] = self._c.get(name, 0) + int(n)
        return self._c[name]

    def snapshot(self) -> dict[str, int]:
        return dict(self._c)

    def reset(self) -> None:
        self._c.clear()


_handle = None


def _actor(create: bool):
    global _handle
    if _handle is not None:
        return _handle
    try:
        _handle = ray.get_actor(_NAME, namespace=_NS)
    except ValueError:
        if not create:
            return None
        try:
            # detached: named actors are otherwise reference-counted and
            # die the moment the incrementing task's handle goes away
            _handle = _CounterActor.options(
                name=_NAME, namespace=_NS, lifetime="detached").remote()
        except ValueError:      # lost a creation race: fetch the winner
            _handle = ray.get_actor(_NAME, namespace=_NS)
    return _handle


def inc(name: str, n: int = 1) -> None:
    """Add ``n`` to counter ``name`` (blocking; call on degradation
    events only)."""
    if n:
        ray.get(_actor(create=True).inc.remote(name, n))


def snapshot() -> dict[str, int]:
    """Current counter values; ``{}`` if no event ever fired."""
    a = _actor(create=False)
    return ray.get(a.snapshot.remote()) if a is not None else {}


def reset() -> None:
    """Zero all counters (test / per-job isolation)."""
    a = _actor(create=False)
    if a is not None:
        ray.get(a.reset.remote())
