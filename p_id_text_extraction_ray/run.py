"""CLI / ``ray job submit`` entrypoint.

    ray job submit -- python -m p_id_text_extraction_ray.run \
        --docs /data/docs.parquet --media /data/media --out /data/out \
        --partitions 64 --wave 16

Owns the Ray session (guarded: attaches to an existing cluster when one is
initialised, e.g. under the job supervisor). The run is resumable — rerun
the same command after a failure and completed partitions are skipped
(state/manifest.py).
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="input doc table (parquet/lance)")
    ap.add_argument("--media", required=True, help="media store root")
    ap.add_argument("--out", required=True, help="output root (spans/ + manifest/)")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--wave", type=int, default=16)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (ignored on a cluster)")
    ap.add_argument("--concurrent-waves", type=int, default=1,
                    help="overlap this many waves (wave N+1 reads under "
                         "wave N's recognize tail; clamped to cluster size)")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from .state.manifest import run_resumable
    summary = run_resumable(args.docs, args.media, args.out,
                            num_partitions=args.partitions,
                            wave_partitions=args.wave,
                            concurrent_waves=args.concurrent_waves)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
