"""CLI driver for the flagship extraction job — the ``ray job submit``
entrypoint (north rule: "launched with ray job submit on fixed N-node and
4N-node clusters").

    ray job submit --working-dir . -- \
        python tools/run_job.py --input /data/corpus --output /data/out \
            --run-id r1 --buckets 256

Locally (single node):

    python tools/run_job.py --input /tmp/corpus --output /tmp/out --run-id r1

This script OWNS the Ray session (the library never calls ``ray.init``):
on a cluster, ``ray job submit`` sets RAY_ADDRESS and ``ray.init()``
connects to it; standalone it starts local mode.  The job is resumable —
re-submitting with the same output directory skips every committed
partition (checkpoint manifests are the source of truth), which is exactly
how a 100-TB run survives preemption: each submission converges further.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="corpus parquet dir")
    p.add_argument("--output", required=True, help="checkpointed output dir")
    p.add_argument("--run-id", required=True,
                   help="unique id for THIS attempt (staging namespace)")
    p.add_argument("--buckets", type=int, default=None,
                   help="url-hash output buckets (default: sharded-by-input"
                        " sink, no shuffle)")
    p.add_argument("--no-fields", action="store_true",
                   help="skip the field-extraction stage")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # ray job submit provides RAY_ADDRESS; standalone falls back local.
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    from document_text_extraction_ray.pipelines.extract_pipeline import (
        run_extraction_job,
        run_sharded_extraction_job,
    )
    from document_text_extraction_ray.sources.corpus import read_corpus

    if args.buckets:
        summary = run_extraction_job(
            read_corpus(args.input), args.output, run_id=args.run_id,
            input_path=args.input, n_buckets=args.buckets,
            with_fields=not args.no_fields,
        )
    else:
        summary = run_sharded_extraction_job(
            args.input, args.output, run_id=args.run_id,
            with_fields=not args.no_fields,
        )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
