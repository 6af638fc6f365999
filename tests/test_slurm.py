"""SLURM array-job launcher: script rendering + run.py CLI integration
(the reference's `hydra/launcher=slurm` submitit surface, README.md:140)."""

import pathlib
import re

import pytest


def test_render_sbatch_array_and_knobs(tmp_path):
    from w2v2_speaker_tpu.runtime.slurm import render_sbatch

    launcher = {
        "name": "sweepy",
        "timeout_min": 60,
        "cpus_per_task": 4,
        "mem_gb": 10,
        "array_parallelism": 3,
        "partition": "tpu",
        "exclude": "cn104",
        "gres": "tpu:1",
        "signal_delay_s": 90,
        "additional_parameters": {"mail-type": "END"},
    }
    cmds = [f"python run.py optim.algo.lr={lr}" for lr in (1, 2, 3, 4)]
    script = render_sbatch(launcher, cmds, tmp_path)
    assert script.startswith("#!/bin/bash")
    assert "#SBATCH --array=0-3%3" in script
    assert "#SBATCH --job-name=sweepy" in script
    assert "#SBATCH --partition=tpu" in script
    assert "#SBATCH --exclude=cn104" in script
    assert "#SBATCH --gres=tpu:1" in script
    assert "#SBATCH --mem=10G" in script
    assert "#SBATCH --signal=USR1@90" in script
    assert "#SBATCH --mail-type=END" in script
    assert 'eval "${CMDS[$SLURM_ARRAY_TASK_ID]}"' in script
    # every command present, quoted as one array element each
    for cmd in cmds:
        assert cmd in script


def test_launch_slurm_dry_run_writes_script(tmp_path, capsys):
    from w2v2_speaker_tpu.runtime.slurm import launch_slurm

    path = launch_slurm(
        {"array_parallelism": 2},
        [["a=1", "b=x y"], ["a=2", "b=z"]],
        tmp_path / "sweep",
        submit=False,
    )
    assert path.exists()
    text = path.read_text()
    assert "--array=0-1%2" in text
    assert "'a=1 b=x y'" in text.replace('run.py a=1', "RUNPY") or "a=1" in text
    # shell-quoting survives spaces in override values
    assert re.search(r"b=x y", text)
    assert "submit with" in capsys.readouterr().out


def test_run_cli_slurm_launcher_renders_grid(tmp_path, capsys, monkeypatch):
    """`run.py -m hydra/launcher=slurm k=a,b` must expand the grid into one
    array task per combination without training locally."""
    import math
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import run as run_cli

    out = run_cli.main(
        [
            "-m",
            "hydra/launcher=slurm",
            "hydra.launcher.array_parallelism=7",
            "hydra.launcher.partition=das",
            "+experiment=speaker_dummy",
            "optim.algo.lr=1e-3,1e-4,1e-5",
            f"trainer.checkpoint_dir={tmp_path / 'ckpt'}",
        ]
    )
    assert math.isnan(out)
    script = tmp_path / "ckpt" / ".slurm" / "sweep.sbatch"
    assert script.exists()
    text = script.read_text()
    assert "#SBATCH --array=0-2%7" in text
    assert "#SBATCH --partition=das" in text
    # launcher overrides are stripped from the per-task commands
    assert "hydra" not in text.split("CMDS=(")[1]
    for lr in ("1e-3", "1e-4", "1e-5"):
        assert f"optim.algo.lr={lr}" in text
    # every array task gets its own checkpoint subdir (concurrent tasks
    # with array_parallelism > 1 must not clobber each other's checkpoints)
    for i in range(3):
        assert f"trainer.checkpoint_dir={tmp_path / 'ckpt'}/job{i}" in text


def test_run_cli_slurm_default_ckpt_stays_unresolved(
    tmp_path, monkeypatch, capsys
):
    """Without a pinned checkpoint dir, the per-task override must forward
    the config's raw `${...}` template so each array task resolves its OWN
    `${random_uuid:}` experiment name (resolving at submit time would
    scatter one task's checkpoints across another's experiment dir)."""
    import pathlib as _pl
    import sys

    sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
    import run as run_cli

    monkeypatch.setenv("LOG_FOLDER", str(tmp_path / "logs"))
    monkeypatch.setenv("DATA_FOLDER", str(tmp_path / "data"))
    run_cli.main(
        [
            "-m",
            "hydra/launcher=slurm",
            f"hydra.launcher.submitit_folder={tmp_path / 'slurm'}",
            "+experiment=speaker_dummy",
            "seed=1,2",
        ]
    )
    text = (tmp_path / "slurm" / "sweep.sbatch").read_text()
    assert (
        "trainer.checkpoint_dir="
        "${log_folder}/${experiment_name}/checkpoints/job0" in text
    )
