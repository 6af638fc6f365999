#!/usr/bin/env python
"""Train + evaluate entry point (the reference's `run.py` CLI contract).

Usage mirrors Hydra (`/root/reference/run.py:31-48`, README commands):

    python run.py +experiment=speaker_xvector \\
        data.module.data_dir=/data/voxceleb/wav \\
        trainer.max_steps=100000 optim.algo.lr=4e-4 tag=mytag

Loads `.env`-style variables from an `.env` file when present (the reference
uses python-dotenv), composes `config/train_eval.yaml` with the overrides,
runs training + evaluation, prints and returns the scalar objective
(EER or WER) for sweepers.
"""

from __future__ import annotations

import os
import pathlib
import sys

CONFIG_DIR = pathlib.Path(__file__).parent / "config"


def _load_dotenv(path: pathlib.Path = pathlib.Path(".env")) -> None:
    if not path.exists():
        return
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        os.environ.setdefault(k.strip(), v.strip())


def _expand_multirun(overrides):
    """Hydra-style grid sweep: `key=a,b` fans out (lists `[a,b]` do not)."""
    import itertools

    fixed, axes = [], []
    for ov in overrides:
        key, _, raw = ov.partition("=")
        if "," in raw and not raw.strip().startswith(("[", "{")):
            axes.append([(key, v) for v in raw.split(",")])
        else:
            fixed.append(ov)
    if not axes:
        return [overrides]
    runs = []
    for combo in itertools.product(*axes):
        runs.append(fixed + [f"{k}={v}" for k, v in combo])
    return runs


def _run_search(overrides, load_config, run_train_eval) -> float:
    """TPE hyperparameter search (the reference's optuna sweeper presets,
    `config/search/*.yaml`): `python run.py -m +search=lr_and_pooling ...`.

    Each trial composes the full config (incl. the search preset's own
    defaults overrides) plus the sampled `key=value` overrides, runs
    train+eval, and feeds the scalar objective back to the sampler."""
    from w2v2_speaker_tpu.runtime.sweeper import TPESampler, format_override

    # compose once to read the search settings (incl. CLI overrides on them)
    base_cfg = load_config(CONFIG_DIR, "train_eval", overrides)
    scfg = base_cfg.get("search") or {}
    if not scfg.get("search_space"):
        raise SystemExit(
            "search preset has no search_space (use +search=<preset>)"
        )
    if not base_cfg.get("eval_model", True):
        # the sampler learns from the eval objective; fail before burning
        # n_trials of training compute on runs that can't report one
        raise SystemExit(
            "hyperparameter search requires eval_model=true "
            "(the objective is the evaluation EER/WER)"
        )
    sampler = TPESampler(
        scfg["search_space"],
        seed=int(scfg.get("seed", 123)),
        n_startup_trials=int(scfg.get("n_startup_trials", 10)),
        direction=scfg.get("direction", "minimize"),
    )
    n_trials = int(scfg.get("n_trials", 128))
    study = scfg.get("study_name", "search")
    base_ckpt = str(base_cfg["trainer"]["checkpoint_dir"])
    for i in range(n_trials):
        params = sampler.ask()
        trial_ovs = [format_override(k, v) for k, v in params.items()]
        print(f"=== search trial {i}/{n_trials} [{study}]: {trial_ovs}")
        cfg = load_config(CONFIG_DIR, "train_eval", overrides + trial_ovs)
        cfg["trainer"]["checkpoint_dir"] = f"{base_ckpt}/trial{i}"
        try:
            objective = run_train_eval(cfg)
            objective = float(objective) if objective is not None else None
        except (FloatingPointError, ValueError, RuntimeError) as e:
            # failed trials are pruned, not fatal (the reference's sweeps
            # survive via sentinel EER fallbacks, eval_metrics sentinels)
            print(f"trial {i} failed: {e!r}")
            continue
        if objective is None:
            print(f"trial {i} produced no objective; pruned")
            continue
        sampler.tell(params, objective)
        print(f"trial {i} objective: {objective}")
    best_params, best = sampler.best
    print(f"=== search [{study}] best objective: {best}")
    for k, v in best_params.items():
        print(f"  {format_override(k, v)}")
    print(f"objective: {best}")
    return best


def _pop_launcher(overrides):
    """Split off `hydra/launcher=<name>` + `hydra.launcher.key=value`
    overrides (the reference's submitit-launcher CLI surface,
    `README.md:140`); returns (launcher_cfg | None, remaining_overrides)."""
    name, knobs, rest = None, [], []
    for ov in overrides:
        key, _, val = ov.partition("=")
        if key.lstrip("+") == "hydra/launcher":
            name = val
        elif key.startswith("hydra.launcher."):
            knobs.append((key[len("hydra.launcher."):], val))
        else:
            rest.append(ov)
    if name is None:
        return None, rest
    import yaml

    path = CONFIG_DIR / "hydra" / "launcher" / f"{name}.yaml"
    if not path.exists():
        raise SystemExit(f"unknown launcher {name!r} ({path} missing)")
    launcher = yaml.safe_load(path.read_text()) or {}
    for k, v in knobs:
        launcher[k] = yaml.safe_load(v)
    return launcher, rest


def main(argv=None) -> float:
    _load_dotenv()
    overrides = list(sys.argv[1:] if argv is None else argv)
    if overrides[:1] == ["-sc"]:
        # shell completion (the reference's hydra `-sc install=bash` surface,
        # preparation_scripts/hydra_bash_complete.sh)
        from w2v2_speaker_tpu.runtime.completion import handle_shell_completion

        handle_shell_completion(
            CONFIG_DIR, overrides[1:], script_path=__file__
        )
        return None
    multirun = False
    for flag in ("-m", "--multirun"):
        if flag in overrides:
            overrides.remove(flag)
            multirun = True

    from w2v2_speaker_tpu.runtime.compile_cache import (
        enable_compilation_cache,
    )
    from w2v2_speaker_tpu.runtime.config import load_config
    from w2v2_speaker_tpu.runtime.experiment import run_train_eval

    launcher, overrides = _pop_launcher(overrides)
    if launcher is not None:
        # render/submit the sweep as a SLURM array job; each task re-enters
        # run.py without the launcher overrides
        import math

        from w2v2_speaker_tpu.runtime.slurm import launch_slurm

        runs = _expand_multirun(overrides) if multirun else [overrides]
        base_cfg = load_config(CONFIG_DIR, "train_eval", overrides)
        sweep_dir = launcher.get("submitit_folder") or (
            str(base_cfg["trainer"]["checkpoint_dir"]) + "/.slurm"
        )
        if multirun:
            # mirror the local multirun path: every array task gets its own
            # checkpoint subdir, otherwise concurrent tasks
            # (array_parallelism > 1) clobber each other's checkpoints and
            # corrupt best-checkpoint selection. The override is left as an
            # UNRESOLVED interpolation unless the user pinned an explicit
            # dir: resolving it at submit time would bake the submitting
            # process's ${random_uuid:} experiment name into the checkpoint
            # path while each array task resolves a fresh uuid for its
            # log_dir — scattering one run's checkpoints and TB events
            # across unrelated experiment dirs.
            jobs = []
            for i, run_overrides in enumerate(runs):
                # compose the run's config WITHOUT resolving so a dir pinned
                # anywhere (trainer YAML, experiment preset, or CLI) is
                # honored, while the default's ${...} template still
                # resolves inside each array task
                raw = load_config(
                    CONFIG_DIR,
                    "train_eval",
                    run_overrides,
                    resolve_interpolations=False,
                )
                ckpt = str(raw["trainer"]["checkpoint_dir"])
                jobs.append(
                    run_overrides
                    + [f"trainer.checkpoint_dir={ckpt}/job{i}"]
                )
            runs = jobs
        launch_slurm(launcher, runs, pathlib.Path(sweep_dir))
        return math.nan  # objective is produced by the array tasks

    # Persist compiled executables across invocations (the reference pays
    # no compile tax — eager torch; without this every run pays minutes of
    # remote XLA compiles before step 1). W2V2_COMPILE_CACHE=0 opts out.
    # AFTER the launcher branch: submitting a SLURM sweep is device-free
    # and must not touch jax state.
    enable_compilation_cache()

    has_search = any(
        ov.split("=", 1)[0].lstrip("+") == "search" for ov in overrides
    )
    if has_search:
        return _run_search(overrides, load_config, run_train_eval)

    if not multirun:
        cfg = load_config(CONFIG_DIR, "train_eval", overrides)
        objective = run_train_eval(cfg)
        print(f"objective: {objective}")
        return objective

    # grid sweep (the reference's hydra-multirun/sweeper role)
    results = []
    for i, run_overrides in enumerate(_expand_multirun(overrides)):
        print(f"=== multirun job {i}: {run_overrides}")
        cfg = load_config(CONFIG_DIR, "train_eval", run_overrides)
        # each sweep job gets its own checkpoint subdir (hydra sweep-dir role)
        cfg["trainer"]["checkpoint_dir"] = (
            str(cfg["trainer"]["checkpoint_dir"]) + f"/job{i}"
        )
        results.append((run_overrides, run_train_eval(cfg)))
    print("=== multirun summary (sorted by objective)")
    # eval_model=false jobs return None (train-only sweeps): sort them last
    results.sort(
        key=lambda r: (r[1] is None, r[1] if r[1] is not None else 0.0)
    )
    for run_overrides, objective in results:
        shown = f"{objective:.5f}" if objective is not None else "None   "
        print(f"{shown}  {run_overrides}")
    best = results[0][1]
    print(f"objective: {best}")
    return best


if __name__ == "__main__":
    main()
