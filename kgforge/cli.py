"""CLI — the reference's command-line surface on the Ray engine.

    python -m kgforge.cli -c CONFIG.ini [-o OUT_DIR] [--union]

CONFIG.ini is a reference-style options file (per-source file / domain /
delimiter / semantics / active — csv2rdf-v5/csv2rdf-v5.py:109-141); each
active source is converted to a sorted N-Triples graph + Parquet mirror,
plus the shared to-define-in-ontology.txt side output. ``--union``
reproduces v1's single-shared-store orchestrator.

This entry point OWNS the Ray session (library code never does).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="kgforge", description="CSV/Parquet -> RDF on Ray Data")
    ap.add_argument("-c", "--conf", required=True,
                    help="options .ini file (reference format)")
    ap.add_argument("-o", "--out", default="kgforge-out",
                    help="output directory")
    ap.add_argument("--union", action="store_true",
                    help="accumulate all sources into one store (v1 mode)")
    ap.add_argument("--turtle", action="store_true",
                    help="also emit prefixed Turtle shards (graph.ttl/), "
                         "the reference's artifact format")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from .pipelines.orchestrator import run_sources
    t0 = time.time()
    written = run_sources(args.conf, args.out, union_stores=args.union,
                          turtle=args.turtle)
    for w in written:
        print(f"wrote {w}")
    print(f"done in {time.time() - t0:.1f}s")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
