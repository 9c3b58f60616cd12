#!/usr/bin/env python
"""Render launcher scripts for a grid-search manifest.

The analog of the reference's scripts/generate_<task>_grid_search_scripts.py
(LSF bsub/jsrun launchers with a 118-minute timeout, last.ckpt resume and
HALT-file completion detection,
generate_lba_grid_search_scripts.py:19-76) targeting plain bash or Slurm:

    python scripts/generate_grid_search_scripts.py \\
        --manifest grid_search/lba_runs.json --scheduler bash

Each generated script:
  - skips itself if its ``<run_id>.done`` HALT file exists (the trainer
    writes it in on_fit_end via write_halt_file),
  - runs training under ``timeout`` so cluster preemption windows are
  respected,
  - resumes from the run's last checkpoint on resubmission.
"""

import argparse
import json
import os
import stat

BASH_TEMPLATE = """#!/bin/bash
# grid-search run {run_id} (auto-generated)
set -u
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
HALT_FILE="$SCRIPT_DIR/{run_id}.done"
if [ -f "$HALT_FILE" ]; then
  echo "{run_id}: already complete (HALT file present)"
  exit 0
fi
RUN_DIR="$SCRIPT_DIR/runs/{run_id}"
mkdir -p "$RUN_DIR"
timeout {timeout_minutes}m python "$SCRIPT_DIR/../train.py" \\
  experiment={experiment} \\
  task_name={run_id} \\
  paths.grid_search_script_dir="$SCRIPT_DIR" \\
  paths.output_dir="$RUN_DIR" \\
  ckpt_path="$RUN_DIR/checkpoints/last" \\
  {overrides}
"""

SLURM_HEADER = """#SBATCH --job-name={run_id}
#SBATCH --time={timeout_minutes}
#SBATCH --output={run_id}.%j.log
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--scheduler", choices=["bash", "slurm"], default="bash")
    ap.add_argument("--timeout-minutes", type=int, default=118)
    ap.add_argument("--output-dir", default=None)
    args = ap.parse_args()

    with open(args.manifest) as f:
        runs = json.load(f)

    out_dir = args.output_dir or os.path.dirname(os.path.abspath(args.manifest))
    os.makedirs(out_dir, exist_ok=True)

    for run in runs:
        overrides = " \\\n  ".join(
            f"{k}={str(v)}" for k, v in sorted(run["overrides"].items())
        )
        body = BASH_TEMPLATE.format(
            run_id=run["run_id"],
            experiment=run["experiment"],
            overrides=overrides,
            timeout_minutes=args.timeout_minutes,
        )
        if args.scheduler == "slurm":
            body = body.replace(
                "#!/bin/bash\n",
                "#!/bin/bash\n"
                + SLURM_HEADER.format(
                    run_id=run["run_id"], timeout_minutes=args.timeout_minutes
                ),
                1,
            )
        path = os.path.join(out_dir, run["run_id"] + ".sh")
        with open(path, "w") as f:
            f.write(body)
        os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    print(f"wrote {len(runs)} launcher scripts to {out_dir}")


if __name__ == "__main__":
    main()
