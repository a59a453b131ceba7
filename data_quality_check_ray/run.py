"""Job entry point: ``python -m data_quality_check_ray.run`` (the
``ray job submit`` target — SURVEY.md §3.5 lifecycle).

Tunables mirror the reference's CLI surface (worker threads / metrics /
log level, data-quality-server/src/main.rs:37-55) as engine-appropriate
flags: batch sizes, actor-pool bounds, partition granularity, resume.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def parse_log_level(s: str) -> int:
    """Log-level parser with Info default (reference P10,
    data-quality-settings/src/lib.rs:111-125)."""
    return getattr(logging, s.upper(), logging.INFO)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="web-text quality-filter job")
    ap.add_argument("--input", required=True, help="dir of pages parquet files")
    ap.add_argument("--output", required=True, help="output dir (resumable)")
    # pipeline-shaped flags default to None so precedence is CLI > env
    # (DQCR_* vars, optionally loaded from a .env beside the entry
    # script — config.load_env_settings) > dataclass defaults
    ap.add_argument("--extract-batch-size", type=int, default=None)
    ap.add_argument("--model-batch-size", type=int, default=None)
    ap.add_argument("--concurrency", type=int, default=0,
                    help="fixed model actor-pool size (0 = autoscale)")
    ap.add_argument("--files-per-partition", type=int, default=4)
    ap.add_argument("--schema-file", default=None,
                    help="JSON schema config (schema.load_schema_file) to "
                         "validate a custom pages-table variant")
    ap.add_argument("--stage-metrics", action="store_true",
                    help="record per-stage duration histograms into lineage")
    ap.add_argument("--hash-groups", type=int, default=0,
                    help=">0: append-stable hashed partition planning with "
                         "this many groups (growing inputs only reprocess "
                         "groups that gained files)")
    ap.add_argument("--clean-stale", action="store_true",
                    help="remove output partitions no longer in the plan "
                         "(shrunk/regrouped input)")
    ap.add_argument("--max-partitions", type=int, default=None,
                    help="stop after N partitions (smoke runs / draining)")
    ap.add_argument("--num-cpus", type=int, default=0,
                    help="ray.init num_cpus when starting a local session")
    ap.add_argument("--watch", type=float, default=0.0, metavar="SECONDS",
                    help="daemon mode: re-scan the input dir every "
                         "SECONDS and process only partitions that are "
                         "new/changed per the manifest diff (the "
                         "reference config-producer's --loop + interval, "
                         "config-producer-proto/src/main.rs:113-117); "
                         "0 = one-shot")
    ap.add_argument("--max-scans", type=int, default=0,
                    help="watch mode: stop after N scans (0 = forever); "
                         "for tests and bounded drains")
    ap.add_argument("--log-level", default="info")
    args = ap.parse_args(argv)

    logging.basicConfig(level=parse_log_level(args.log_level))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus or None,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import dataclasses

    from .config import load_env_settings, pipeline_config_from_env
    from .pipelines.runner import RunConfig, run

    # reference settings-crate analog: .env beside the entry script
    # (skipped in containers), then DQCR_* env vars as config defaults
    load_env_settings()
    env_cfg = pipeline_config_from_env()
    conc = (
        (args.concurrency, args.concurrency)
        if args.concurrency
        else env_cfg.model_concurrency
    )
    cfg = RunConfig(
        input_dir=args.input,
        output_dir=args.output,
        pipeline=dataclasses.replace(
            env_cfg,
            extract_batch_size=(args.extract_batch_size
                                if args.extract_batch_size is not None
                                else env_cfg.extract_batch_size),
            model_batch_size=(args.model_batch_size
                              if args.model_batch_size is not None
                              else env_cfg.model_batch_size),
            model_concurrency=conc,
            schema_file=args.schema_file or env_cfg.schema_file,
            stage_metrics=args.stage_metrics or env_cfg.stage_metrics,
        ),
        files_per_partition=args.files_per_partition,
        hash_groups=args.hash_groups,
        clean_stale=args.clean_stale,
        max_partitions=args.max_partitions,
    )
    if args.watch > 0:
        # daemon re-scan loop over the existing manifest diff: each scan
        # replans against the CURRENT input dir and processes only
        # partitions the manifest doesn't already mark done (use
        # --hash-groups for append-stable planning so a growing dir only
        # reprocesses groups that gained files)
        import time

        scan = 0
        summary = None
        while True:
            scan += 1
            summary = run(cfg)
            summary["scan"] = scan
            print(json.dumps(summary), flush=True)
            if args.max_scans and scan >= args.max_scans:
                break
            time.sleep(args.watch)
        ray.shutdown()
        return 0 if summary["complete"] else 1
    summary = run(cfg)
    print(json.dumps(summary))
    ray.shutdown()
    return 0 if summary["complete"] else 1


if __name__ == "__main__":
    sys.exit(main())
