"""CLI entry point — `python -m gdal_ray.cli pipeline.json [--show N]`.

The `ray job submit` payload: on a cluster, submit this module with the
pipeline spec (`ray job submit -- python -m gdal_ray.cli spec.json`).
Owns the Ray session (guarded init; the driver-contract surfaces in
__ray_entry__ never init)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gdal_ray")
    ap.add_argument("pipeline", help="path to JSON pipeline spec")
    ap.add_argument("--show", type=int, default=5,
                    help="rows of the result to print (0 = just count)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    with open(args.pipeline) as f:
        spec = json.load(f)

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
    try:
        from .pipelines.registry import run_pipeline

        ds = run_pipeline(spec)
        n = 0
        shown = 0
        for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
            if shown < args.show:
                for row in b.slice(0, args.show - shown).to_pylist():
                    print(json.dumps(row, default=str))
                    shown += 1
            n += len(b)
        print(f"# {n} rows", file=sys.stderr)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
