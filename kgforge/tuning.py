"""Shared Ray Data context tuning for every kgforge entry point.

One place for the session-level DataContext knobs that the driver
contract (`__ray_entry__._tune_context`), `bench.py`, and the
production runner all need. Nothing here calls ``ray.init`` — the
caller owns the session; these are idempotent context mutations.

Rationale for each knob (all measured on this engine's pipelines,
BASELINE.md):

- ``read_op_min_num_blocks``: the default 200-block floor shreds
  small inputs into sub-CPU-count fragments.
- ``SORT_SHUFFLE_PUSH_BASED``: the pull-based sort shuffle measured
  1.7× slower on the dedup exchange.
- ``max_hash_shuffle_aggregators``: the default pool (64 actors)
  dwarfs small sessions.
- ``op_resource_reservation_enabled = False``: Ray's streaming
  executor reserves an equal slice of the object-store budget per
  operator and caps each operator's in-flight tasks to its slice.
  On kgforge's pipeline shapes — linear map chains fanning out of one
  bounded materialized table — that policy left 50–70 % of CPUs idle
  behind per-op memory budgets while the store itself sat at <10 %
  occupancy and NEVER spilled: the webkg flagship at 1.28M docs /
  16 CPUs ran its branch maps at 3–5 concurrent tasks
  (``[backpressured:tasks]``) and measured 19.8 s; reservation ratio
  0.8 → 26.7 s, 0.2 → 16.3 s, disabled → 12.5 s (all spill-free).
  kgforge intermediates are bounded by design (derived tables, never
  the raw corpus — see pipelines/webkg.py CombinedEmit), so the
  deadlock-avoidance reservation protects against a shape this engine
  does not produce; plain object-store backpressure + spilling remains
  as the safety net. Set ``KGFORGE_OP_RESERVATION=1`` to restore
  Ray's default policy (e.g. for a pipeline that DOES stream an
  unbounded corpus through a fan-in).
"""

from __future__ import annotations

import os


def tune_data_context(ncpu: int | None = None) -> None:
    """Apply kgforge's measured DataContext settings to the current
    session. ``ncpu``: the session CPU count; inferred from the live
    Ray cluster when omitted."""
    import ray
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    if ncpu is None:
        ncpu = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
    ctx.read_op_min_num_blocks = max(8, ncpu)
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    ctx.max_hash_shuffle_aggregators = max(2, min(8, ncpu // 4))
    if os.environ.get("KGFORGE_OP_RESERVATION") != "1":
        ctx.op_resource_reservation_enabled = False
