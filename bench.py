"""Benchmark harness (driver contract).

Default: runs the headline extraction pipeline + every queries() entry over
$GRAFT_SF_DIR (default /root/testdata/sf0.1) under
ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32) and prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "num_cpus": N,
   "headline": {docs, html_mb, docs_per_s, mb_per_s}}

--scaling: runs the headline pipeline in fresh subprocesses at num_cpus=8 and
num_cpus=32 on the SAME input (page cache warmed by the first generation) and
reports both throughputs + scaling efficiency
  eff = (t_small / t_large) / (cpus_large / cpus_small).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_N = int(os.environ.get("BENCH_N", "400000"))
CORPUS_BASE = os.environ.get("BENCH_CORPUS_DIR", "/tmp/dte_bench_corpus")
# Output sink location.  On this single-node sandbox /tmp sits on one
# ~64 MB/s-fsync virtual disk, which becomes the non-scaling floor of the
# headline once the compute side is fast (the 757 MB output write does not
# parallelize with CPUs on one disk).  A real cluster writes per-node /
# object-store, so the single-disk floor is a sandbox artifact — the
# scaling harness therefore defaults the sink to tmpfs to measure the
# ENGINE's scaling; set BENCH_OUT_DIR=/tmp/... to include the disk.
OUT_DIR = os.environ.get("BENCH_OUT_DIR", "/tmp/dte_bench_out")

QUERY_SKIP = {"synth_extract"}  # covered by the headline itself


def run_headline() -> dict:
    """Flagship job: read corpus parquet -> extract(+fields) -> bucketed write."""
    import shutil

    import ray

    from document_text_extraction_ray.pipelines.extract_pipeline import (
        run_sharded_extraction_job,
    )
    from document_text_extraction_ray.sources.corpus import (
        materialize_corpus_parquet,
        read_corpus,
    )

    corpus_path = materialize_corpus_parquet(BENCH_N, seed=42, base_dir=CORPUS_BASE)
    html_bytes = sum(
        os.path.getsize(os.path.join(corpus_path, f))
        for f in os.listdir(corpus_path)
        if f.endswith(".parquet")
    )
    # Warm the page cache so we measure compute, not first disk read.
    read_corpus(corpus_path, columns=["url"]).count()

    shutil.rmtree(OUT_DIR, ignore_errors=True)
    t0 = time.perf_counter()
    run_sharded_extraction_job(
        corpus_path,
        OUT_DIR,
        run_id=f"bench-{NUM_CPUS}",
        files_per_partition=int(os.environ.get("BENCH_FILES_PER_PART", "100")),
        n_buckets=64,
        max_concurrent_partitions=int(os.environ.get("BENCH_PART_CONC", "2")),
        # 0 = no block-count override: keeps read->extract->write fused.
        blocks_per_cpu=int(os.environ.get("BENCH_BLOCKS_PER_CPU", "0")) or None,
    )
    elapsed = time.perf_counter() - t0
    return {
        "sec": round(elapsed, 3),
        "docs": BENCH_N,
        "input_mb": round(html_bytes / 1e6, 1),
        "docs_per_s": round(BENCH_N / elapsed, 1),
        "mb_per_s": round(html_bytes / 1e6 / elapsed, 2),
    }


def run_queries() -> dict:
    import pyarrow as pa

    import __ray_entry__ as entrymod
    import ray.data

    out = {}
    for name, fn in entrymod.queries().items():
        if name in QUERY_SKIP:
            continue
        t0 = time.perf_counter()
        result = fn(SF_DIR)
        if isinstance(result, ray.data.Dataset):
            result.to_pandas()  # consume the lazy pipeline
        elif isinstance(result, pa.Table):
            pass
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main_bench():
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # Best-of-2: the first headline run pays cold worker-pool spinup and
    # page-cache warmup (~20-30% on this host), and the host's wall-clock
    # noise band is ~2x (see BASELINE.md) — a single cold sample
    # under-reports the engine.  Both samples are recorded.
    h1 = run_headline()
    h2 = run_headline()
    headline = min(h1, h2, key=lambda h: h["sec"])
    headline["samples_sec"] = [h1["sec"], h2["sec"]]
    queries = run_queries()
    ray.shutdown()
    # KEY ORDER AND SIZE MATTER: the round driver captures only the LAST
    # ~2000 characters of stdout and json-parses the final line (r2's line
    # overflowed at 72 queries -> "parsed": null).  So (a) the line is
    # compact (no-space separators, 2-decimal query secs, summarized
    # scaling), and (b) the big queries dict comes FIRST so that even if a
    # future registry overflows again, the tail window still ends with the
    # human-readable headline/scaling summary.
    out = {
        "queries": {k: round(v, 2) for k, v in queries.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "headline": headline,
        "metric": f"headline extract wall ({BENCH_N} CC pages)",
        "value": headline["sec"],
        "unit": "sec",
    }
    # Diffable scaling evidence: summarize the last `bench.py --scaling`
    # result (SCALING.json, full detail) so BENCH_r*.json carries the
    # two-parallelism throughputs + efficiency per round.
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            s = json.load(f)
        lo, hi = s.get("cpus_small", 4), s.get("cpus_large", 16)
        out["scaling"] = {
            "efficiency": s.get("value"),
            "cpus": f"{lo}v{hi}",
            f"sec_{lo}": s.get(f"sec_{lo}"),
            f"sec_{hi}": s.get(f"sec_{hi}"),
            # Staleness keyed on the ENGINE PACKAGE tree hash, not the
            # commit — doc/test commits don't invalidate a measurement.
            "stale": s.get("measured_pkg_tree", "unknown") != _pkg_tree(),
        }
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:  # keep inside the driver's tail-capture window
        out["queries"] = {k: round(v, 1) for k, v in out["queries"].items()}
        line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:
        # Registry outgrew the window even at 1 decimal: summarize the
        # sweep (count/total + the slowest entries) and persist the full
        # per-query dict to QUERIES_BENCH.json next to the repo instead.
        full = out["queries"]
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "QUERIES_BENCH.json"), "w") as f:
            json.dump({"sf": SF_DIR, "num_cpus": NUM_CPUS,
                       "queries": full}, f, indent=1, sort_keys=True)
        slowest = dict(sorted(full.items(), key=lambda kv: -kv[1])[:10])
        out["queries"] = {"n": len(full),
                          "total_sec": round(sum(full.values()), 1),
                          "full_in": "QUERIES_BENCH.json",
                          "slowest": slowest}
        line = json.dumps(out, separators=(",", ":"))
    print(line)


def run_at(ncpu: int, repeats: int | None = None) -> dict:
    """Best-of-N child runs (min wall time): damps frequency-scaling and
    page-cache noise (observed ±15% run-to-run on this host)."""
    repeats = repeats or int(os.environ.get("BENCH_REPEATS", "3"))
    best = None
    for _ in range(repeats):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_SCALING_CHILD="1")
        # Default the scaling children's sink to tmpfs (see OUT_DIR note):
        # the single-disk write floor would otherwise cap the high-CPU run.
        env.setdefault("BENCH_OUT_DIR", "/dev/shm/dte_bench_out")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        d = json.loads(out.strip().splitlines()[-1])
        if best is None or d["value"] < best["value"]:
            best = d
    return best


def main_hw_ceiling():
    """Hardware-scaling calibration (no Ray): run the extraction kernel
    under plain multiprocessing at BENCH_CPUS_LO / BENCH_CPUS_HI workers
    over the same parquet files and report the throughput ratio.  On this
    virtualized host per-core throughput FALLS as more cores engage
    (frequency scaling / shared memory bandwidth: measured kernel-only
    ceilings ~0.93 @ 2v8, ~0.87 @ 4v16, ~0.83 @ 8v32) — this mode
    measures that ceiling so the Ray job's efficiency can be read against
    what the machine itself allows, not against an impossible 1.0."""
    import glob
    from multiprocessing import Pool

    lo, hi = (int(os.environ.get("BENCH_CPUS_LO", "4")),
              int(os.environ.get("BENCH_CPUS_HI", "16")))
    corpus = os.path.join(CORPUS_BASE, f"n{BENCH_N}_seed42")
    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    if not files:
        print(json.dumps({"error": f"no corpus at {corpus}; run bench.py first"}))
        return
    rates = {}
    for n in (lo, hi):
        sub = files[: max(32, n * 6)]
        with Pool(n) as p:
            p.map(_hw_task, sub[:n])  # warm imports/page cache
            t0 = time.perf_counter()
            p.map(_hw_task, sub)
            wall = time.perf_counter() - t0
        import pyarrow.parquet as _pq

        rows = sum(_pq.ParquetFile(f).metadata.num_rows for f in sub)
        rates[n] = rows / wall
    print(json.dumps({
        "metric": f"kernel-only multiprocessing scaling ceiling ({lo} vs {hi} procs)",
        "value": round(rates[hi] / rates[lo] / (hi / lo), 3),
        "unit": "efficiency",
        f"docs_per_s_{lo}": round(rates[lo], 1),
        f"docs_per_s_{hi}": round(rates[hi], 1),
    }))


def _hw_task(path: str):
    import pyarrow.parquet as _pq

    from document_text_extraction_ray.stages.extract import extract_batch

    extract_batch(_pq.read_table(path))


def main_scaling():
    lo_cpus, hi_cpus = int(os.environ.get("BENCH_CPUS_LO", "4")), int(os.environ.get("BENCH_CPUS_HI", "16"))
    # Pre-generate the corpus at full parallelism: the low-CPU child would
    # otherwise pay ~5 minutes of (untimed but wall-clock) generation.
    env = dict(os.environ, RAY_GRAFT_CPUS="32", BENCH_GEN_ONLY="1")
    subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                   capture_output=True, text=True, check=True,
                   cwd=os.path.dirname(os.path.abspath(__file__)))
    lo = run_at(lo_cpus)
    hi = run_at(hi_cpus)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    result = {
        "metric": "headline throughput scaling efficiency "
                  f"({lo_cpus} vs {hi_cpus} cpus, same input)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "cpus_small": lo_cpus,
        "cpus_large": hi_cpus,
        f"sec_{lo_cpus}": t_lo,
        f"sec_{hi_cpus}": t_hi,
        f"docs_per_s_{lo_cpus}": lo["headline"]["docs_per_s"],
        f"docs_per_s_{hi_cpus}": hi["headline"]["docs_per_s"],
        "sf": SF_DIR,
        # Self-describing sink: the children default to tmpfs (see OUT_DIR
        # note) so the single-disk write floor doesn't cap the high-CPU
        # run — record what was actually used (ADVICE r3).
        "out_dir": os.environ.get("BENCH_OUT_DIR", "/dev/shm/dte_bench_out"),
    }
    result["measured_at_commit"] = _git_head()
    result["measured_pkg_tree"] = _pkg_tree()
    # Persist next to the repo so plain `bench.py` runs embed it per round.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SCALING.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


def _git_head() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except Exception:
        return "unknown"


def _pkg_tree() -> str:
    """Staleness key for embedded scaling results: a combined hash of the
    modules the HEADLINE pipeline actually executes (read -> html extract
    -> fields -> checkpointed sink).  Keying on the whole package tree
    re-staled the measurement whenever an unrelated operator (dedup, ANN,
    multimodal...) changed; docs/tests never re-stale it either way."""
    paths = [
        "document_text_extraction_ray/pipelines/extract_pipeline.py",
        "document_text_extraction_ray/sources/corpus.py",
        "document_text_extraction_ray/sources/synth.py",
        "document_text_extraction_ray/functions/html_extract.py",
        "document_text_extraction_ray/functions/fields.py",
        "document_text_extraction_ray/state",
        "document_text_extraction_ray/util.py",
    ]
    try:
        import hashlib

        h = hashlib.sha256()
        for p in paths:
            h.update(subprocess.run(
                ["git", "rev-parse", f"HEAD:{p}"],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout.strip().encode())
        return h.hexdigest()[:12]
    except Exception:
        return "unknown"


if __name__ == "__main__":
    if os.environ.get("BENCH_GEN_ONLY"):
        import ray

        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        from document_text_extraction_ray.sources.corpus import (
            materialize_corpus_parquet,
        )

        materialize_corpus_parquet(BENCH_N, seed=42, base_dir=CORPUS_BASE)
        ray.shutdown()
    elif "--scaling" in sys.argv:
        main_scaling()
    elif "--hw-ceiling" in sys.argv:
        main_hw_ceiling()
    else:
        if os.environ.get("BENCH_SCALING_CHILD"):
            # Scaling children skip the per-query sweep: the criterion is
            # the headline pipeline at two parallelism levels.
            import ray

            ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                     ignore_reinit_error=True, logging_level="ERROR")
            from ray.data import DataContext

            DataContext.get_current().enable_progress_bars = False
            headline = run_headline()
            ray.shutdown()
            print(json.dumps({"metric": "headline", "value": headline["sec"],
                              "unit": "sec", "headline": headline,
                              "num_cpus": NUM_CPUS, "sf": SF_DIR}))
        else:
            main_bench()
