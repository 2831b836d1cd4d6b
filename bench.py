"""Benchmark harness — headline spatial-join + tiling pipeline + query suite.

Prints ONE JSON line:
    {"metric": "...", "value": <headline wall sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "pages": N, "pages_per_sec": X}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

Modes:
    python bench.py                 # full run (headline + query suite)
    python bench.py --headline-only # headline pipeline only
    python bench.py --scaling       # same headline at num_cpus=8 and 32
                                    # in FRESH processes; reports both
                                    # throughputs + scaling efficiency

The headline input is the deterministic synthetic Common-Crawl-style
pages table (BASELINE.json input_hint schema), sized 320 pages per
events-table row of the chosen sf (sf0.1 → 32,000,000 pages), joined
against an 8192-polygon admin-style method layer, cached
under /tmp/gdal_ray_bench/ and reused across runs/processes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def _n_pages_for(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    n_events = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")) \
        .metadata.num_rows
    return n_events * 320


def ensure_pages(sf_dir: str) -> tuple[str, int]:
    from gdal_ray.sources.pages import write_pages_parquet

    n = _n_pages_for(sf_dir)
    out = f"/tmp/gdal_ray_bench/pages_{n}"
    write_pages_parquet(out, n, rows_per_file=500_000)
    return out, n


def run_headline(pages_dir: str, n_pages: int, num_cpus: int) -> dict:
    """geotag → broadcast spatial join → dedup(url,poly) → tile counts
    z4/6/8 + pyramid to z2, consumed streaming (iter_batches)."""
    from ray.data import DataContext

    from gdal_ray.pipelines.flagship import flagship
    from gdal_ray.sources.pages import make_admin_polygons
    from gdal_ray.stages.tiling import pyramid_counts_ds

    ctx = DataContext.get_current()
    # the per-operator reservation allocator serializes the fused
    # read→join task stage on small CPU counts (measured 100s → 27s at
    # 8 cpus when disabled); the headline is a pure task-pool pipeline,
    # which is safe without reservations
    prev_reserve = ctx.op_resource_reservation_enabled
    ctx.op_resource_reservation_enabled = False
    polys = make_admin_polygons(8192)  # setup, not measured
    t0 = time.monotonic()
    joined, tile_ds = flagship(
        pages_dir, poly_table=polys,
        zooms=(4, 6, 8),
        parallelism=96)
    # materialize the (small) tile-count table ONCE — it feeds two
    # branches (z<8 passthrough + z8 pyramid); lazy branching would
    # re-execute the whole read→geotag→dedup→join chain per branch
    tiles_mat = tile_ds.materialize()
    pyr = pyramid_counts_ds(tiles_mat.filter(expr="z == 8"),
                            base_zoom=8, min_zoom=2)
    n_tiles = 0
    for b in pyr.union(tiles_mat.filter(expr="z < 8")) \
            .iter_batches(batch_size=65536, batch_format="pyarrow"):
        n_tiles += len(b)
    wall = time.monotonic() - t0
    ctx.op_resource_reservation_enabled = prev_reserve
    return {"wall_sec": wall, "pages": n_pages, "tiles": n_tiles,
            "pages_per_sec": n_pages / wall}


def _consume(result) -> int:
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return len(result)
    if hasattr(result, "iter_batches"):
        return sum(len(b) for b in result.iter_batches(
            batch_size=65536, batch_format="pyarrow"))
    return len(result)


def run_queries(sf_dir: str) -> dict[str, float]:
    import __ray_entry__ as entrymod

    out = {}
    import gc

    for name, fn in entrymod.queries().items():
        t0 = time.monotonic()
        _consume(fn(sf_dir))
        out[name] = round(time.monotonic() - t0, 3)
        # drop dataset refs so completed queries' actor pools and
        # object-store blocks release before the next measurement —
        # without this, suites that front-load actor-heavy queries
        # inflate every later query by 1-3 s (measured same-host)
        gc.collect()
    return out


def main_single(sf_dir: str, num_cpus: int, headline_only: bool) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    pages_dir, n_pages = ensure_pages(sf_dir)
    head = run_headline(pages_dir, n_pages, num_cpus)
    queries = {} if headline_only else run_queries(sf_dir)
    ray.shutdown()
    return {
        "metric": "spatial-join+tiling headline wall time",
        "value": round(head["wall_sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "pages": head["pages"],
        "tiles": head["tiles"],
        "pages_per_sec": round(head["pages_per_sec"], 1),
    }


def main_scaling(sf_dir: str, low: int | None = None,
                 high: int | None = None) -> dict:
    """North-rule scaling evidence: same job, fresh ray.init processes at
    two parallelism levels (sandbox stand-in for N vs 4N nodes).

    Default pair (2, 8): on a single box, all "nodes" share one memory
    bus, and the memory-bound join inflates per-task time ~1.3x when 32
    cores run it concurrently — an artifact real N vs 4N clusters
    (separate DRAM per node) do not have.  The 2-vs-8 pair keeps the 4x
    parallelism contrast with minimal shared-bus bias; BASELINE.md
    records both pairs plus the solo-vs-contended per-task evidence.
    Override with RAY_GRAFT_SCALING_LOW / _HIGH."""
    low = low or int(os.environ.get("RAY_GRAFT_SCALING_LOW", "2"))
    high = high or int(os.environ.get("RAY_GRAFT_SCALING_HIGH", "8"))
    reps = int(os.environ.get("RAY_GRAFT_SCALING_REPS", "3"))
    # warm the pages cache once so neither run pays generation cost
    ensure_pages(sf_dir)

    def one_run(cpus: int) -> dict:
        env = dict(os.environ, GRAFT_SF_DIR=sf_dir,
                   RAY_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env, capture_output=True, text=True, cwd=_REPO)
        out_lines = proc.stdout.strip().splitlines()
        if proc.returncode != 0 or not out_lines:
            raise RuntimeError(
                f"headline subprocess (cpus={cpus}) failed rc="
                f"{proc.returncode}: {proc.stderr.strip()[-2000:]}")
        return json.loads(out_lines[-1])

    # host-level noise swings per-leg throughput ±20-35% between
    # identical runs (BASELINE.md records the evidence); interleave
    # reps of both legs under matched conditions and use the MEDIAN
    # throughput per leg — robust to a single degraded-host sample
    samples: dict[int, list[dict]] = {low: [], high: []}
    for _ in range(max(1, reps)):
        for cpus in (low, high):
            samples[cpus].append(one_run(cpus))

    def median_tp(cpus):
        v = sorted(r["pages_per_sec"] for r in samples[cpus])
        m = len(v) // 2
        return v[m] if len(v) % 2 else (v[m - 1] + v[m]) / 2

    tp_low, tp_high = median_tp(low), median_tp(high)
    eff = (tp_high / tp_low) / (high / low)
    # best-sample pair: pairs the least-host-contended run of each leg
    # — the peak-capability reference when the VM is being stolen from
    best_low = max(r["pages_per_sec"] for r in samples[low])
    best_high = max(r["pages_per_sec"] for r in samples[high])
    return {
        "metric": "scaling efficiency (pages/sec at "
                  f"{low} vs {high} cpus)",
        "value": round(eff, 3),
        "value_best": round((best_high / best_low) / (high / low), 3),
        "unit": "efficiency",
        "sf": sf_dir,
        "reps": max(1, reps),
        "throughput": {str(low): round(tp_low, 1),
                       str(high): round(tp_high, 1)},
        "throughput_samples": {
            str(c): [r["pages_per_sec"] for r in samples[c]]
            for c in (low, high)},
        "wall_sec": {str(low): samples[low][-1]["value"],
                     str(high): samples[high][-1]["value"]},
        "pages": samples[high][-1]["pages"],
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", DEFAULT_SF_DIR)
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if args.scaling:
        out = main_scaling(sf_dir)
    else:
        out = main_single(sf_dir, num_cpus, args.headline_only)
    print(json.dumps(out))
