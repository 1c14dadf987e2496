"""spark-submit entry point for the full KG-construction job.

Usage (cluster):
    python tools/make_pyfiles.py            # -> dist/denrl_spark.zip
    spark-submit --py-files dist/denrl_spark.zip tools/run_pipeline.py \
        --n-convs 5000 --rounds 2 --output /tmp/kg_out --cpus 32

Local sandbox stands in for the cluster via local[N]; on a real cluster
drop --cpus and let spark-submit's --num-executors control parallelism.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=500)
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--checkpoint", default=None)
    # reference CLI knobs (README.md:30-31)
    ap.add_argument("--threshold", type=float, default=None,
                    help="KL-confidence selection threshold (default 0.5)")
    ap.add_argument("--sample-rate", type=float, default=None,
                    help="negative sampling rate (default 0.1)")
    ap.add_argument("--max-new-patterns", type=int, default=None,
                    help="pattern growth cap per relation per round (default 5)")
    args = ap.parse_args()

    from denrl_spark.plans.pipeline import run_kg_pipeline
    from denrl_spark.session import get_spark

    spark = get_spark(
        args.cpus, app_name="denrl_pipeline",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    report = run_kg_pipeline(
        spark,
        n_convs=args.n_convs,
        seed=args.seed,
        bootstrap_rounds=args.rounds,
        checkpoint_dir=args.checkpoint,
        output_dir=args.output,
        threshold=args.threshold,
        sample_rate=args.sample_rate,
        max_new_patterns=args.max_new_patterns,
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
