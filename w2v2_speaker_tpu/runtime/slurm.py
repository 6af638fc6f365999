"""SLURM array-job launcher for multirun sweeps.

The reference launches its grid sweeps through hydra's submitit plugin
(`/root/reference/config/hydra/launcher/slurm.yaml`, README commands like
`hydra/launcher=slurm hydra.launcher.array_parallelism=7`). submitit is a
GPU-cluster-shaped dependency; the TPU-native equivalent renders the sweep
as ONE sbatch array job — task i runs `python run.py <overrides_i>` in its
own allocation — and submits it with plain `sbatch`. Single-controller JAX
wants exactly one process per host, which an array task provides.

Knob names mirror the reference launcher config so README-style commands
port verbatim; GPU-specific `gpus_per_node` becomes the generic `gres`
(e.g. `tpu:1`).
"""

from __future__ import annotations

import pathlib
import shlex
import shutil
import subprocess
import sys
from typing import Dict, List, Optional, Sequence

__all__ = ["render_sbatch", "launch_slurm"]


def render_sbatch(
    launcher: Dict,
    commands: Sequence[str],
    sweep_dir: pathlib.Path,
) -> str:
    """Render one sbatch array script running `commands[i]` as task i."""
    lines = ["#!/bin/bash"]

    def opt(flag: str, value) -> None:
        if value is None or value == "":
            return
        lines.append(f"#SBATCH --{flag}={value}")

    n = len(commands)
    par = int(launcher.get("array_parallelism", 4))
    opt("job-name", launcher.get("name", "w2v2-speaker-tpu"))
    lines.append(f"#SBATCH --array=0-{n - 1}%{par}")
    opt("time", launcher.get("timeout_min"))
    opt("cpus-per-task", launcher.get("cpus_per_task"))
    mem = launcher.get("mem_gb")
    opt("mem", f"{mem}G" if mem else None)
    opt("nodes", launcher.get("nodes", 1))
    opt("ntasks-per-node", launcher.get("tasks_per_node", 1))
    opt("gres", launcher.get("gres"))
    opt("partition", launcher.get("partition"))
    opt("constraint", launcher.get("constraint"))
    opt("exclude", launcher.get("exclude"))
    opt("comment", launcher.get("comment"))
    sig = launcher.get("signal_delay_s")
    opt("signal", f"USR1@{sig}" if sig else None)
    opt("output", str(sweep_dir / "%A_%a.out"))
    for key, value in (launcher.get("additional_parameters") or {}).items():
        opt(key, value)

    lines.append("")
    lines.append("CMDS=(")
    for cmd in commands:
        lines.append(f"  {shlex.quote(cmd)}")
    lines.append(")")
    lines.append('eval "${CMDS[$SLURM_ARRAY_TASK_ID]}"')
    return "\n".join(lines) + "\n"


def launch_slurm(
    launcher: Dict,
    run_overrides: Sequence[Sequence[str]],
    sweep_dir: pathlib.Path,
    python: Optional[str] = None,
    submit: Optional[bool] = None,
) -> pathlib.Path:
    """Write the array script for a grid sweep and submit it via sbatch.

    `run_overrides` is one override list per sweep job (already expanded —
    the grid fan-out happens in run.py). Returns the script path. When
    `submit` is None, auto-detects `sbatch` on PATH; without it the script
    is only written (dry run) so sweeps can be prepared from a login-free
    host and submitted manually.
    """
    sweep_dir = pathlib.Path(sweep_dir)
    sweep_dir.mkdir(parents=True, exist_ok=True)
    python = python or sys.executable
    run_py = pathlib.Path(__file__).resolve().parents[2] / "run.py"
    commands: List[str] = []
    for ovs in run_overrides:
        parts = [shlex.quote(python), shlex.quote(str(run_py))]
        parts += [shlex.quote(ov) for ov in ovs]
        commands.append(" ".join(parts))

    script = render_sbatch(launcher, commands, sweep_dir)
    path = sweep_dir / "sweep.sbatch"
    path.write_text(script)

    if submit is None:
        submit = shutil.which("sbatch") is not None
    if submit:
        out = subprocess.run(
            ["sbatch", str(path)], capture_output=True, text=True
        )
        print(out.stdout.strip() or out.stderr.strip())
        if out.returncode != 0:
            raise RuntimeError(f"sbatch failed: {out.stderr.strip()}")
    else:
        print(
            f"sbatch not found: array script written to {path} "
            f"({len(commands)} jobs); submit with `sbatch {path}`"
        )
    return path
