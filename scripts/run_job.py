"""`ray job submit`-compatible entrypoint for the flagship extraction job.

    ray job submit --working-dir . -- \
        python scripts/run_job.py --input <pages dir/files> --output <dir> \
            [--partitions 32] [--no-resume] [--skew-split] [--pdf-mode warm]

Owns its Ray session (library code never calls ray.init — SURVEY §7.4);
local fallback initialises a single-node session when no cluster address
is set. Exits non-zero if any partition failed to publish a manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="pages → extracted, resumable")
    ap.add_argument("--input", required=True, nargs="+")
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--skew-split", action="store_true")
    ap.add_argument(
        "--pdf-mode",
        choices=["warm", "finisher", "split", "inline"], default="warm",
        help="warm: per-worker warm parser inside extract tasks (default, "
        "no extra hop); finisher: forwarding + warm-parser actor pool; "
        "split: filtered actor-pool branch (2x read); inline: stateless "
        "tasks only",
    )
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from basicocr_ray.config import ExtractConfig
    from basicocr_ray.pipelines.extract_pipeline import run_extract_job
    from basicocr_ray.state.manifest import load_done_partitions

    cfg = ExtractConfig(num_partitions=args.partitions)
    pdf_branch = {
        "warm": True, "finisher": "finisher", "split": "split",
        "inline": False,
    }[args.pdf_mode]
    stats = run_extract_job(
        args.input if len(args.input) > 1 else args.input[0],
        args.output,
        cfg=cfg,
        resume=not args.no_resume,
        pdf_branch=pdf_branch,
        skew_split=args.skew_split,
    )
    print(json.dumps(stats))
    if not stats.get("skipped"):
        done = load_done_partitions(args.output, stats["input_fingerprint"])
        missing = set(range(args.partitions)) - done
        if missing:
            print(f"ERROR: partitions without manifest: {sorted(missing)}",
                  file=sys.stderr)
            ray.shutdown()
            return 1
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
