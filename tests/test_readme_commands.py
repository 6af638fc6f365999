"""Every `run.py` command published in the reference README composes
verbatim through this repo's CLI surface.

The commands are extracted at test time from `/root/reference/README.md`
(the reference's published reproduction recipes, README.md:148-422) —
no transcription, so drift in either direction fails loudly. Each command
goes through the exact machinery `run.py` uses: `_pop_launcher` for the
`hydra/launcher=slurm` + `hydra.launcher.*` overrides, `_expand_multirun`
for `-m` comma grids, and `load_config` for every expanded job. On top of
bare composition the test asserts the semantics each recipe relies on
(grid sizes, pooled-type validity, tune flags, nested torch-shaped
schedule overrides landing on the flat schedule keys, `100_000`
underscore ints), so a silently-ignored override cannot pass.
"""

import pathlib
import re
import shlex
import sys

import pytest

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

from run import _expand_multirun, _pop_launcher  # noqa: E402
from w2v2_speaker_tpu.runtime.config import load_config  # noqa: E402

CONFIG_DIR = REPO / "config"
README = pathlib.Path("/root/reference/README.md")

pytestmark = pytest.mark.skipif(
    not README.exists(), reason="reference README not mounted"
)


def _readme_commands():
    """All `python run.py ...` commands from the README's fenced blocks,
    backslash-continuations joined, verbatim otherwise."""
    text = README.read_text()
    commands = []
    for block in re.findall(r"```(?:bash)?\n(.*?)```", text, re.DOTALL):
        if "run.py" not in block or "preparation_scripts" in block:
            continue
        # join '\'-continued lines (incl. the README's '\ '-typo at the
        # "no dropout" recipe) into one shell line per command
        joined = re.sub(r"\\[ \t]*\n", " ", block)
        for line in joined.splitlines():
            line = line.strip().rstrip("\\").strip()
            if line.startswith("python run.py"):
                commands.append(line)
    return commands


COMMANDS = _readme_commands()


def _compose(command):
    """Mirror run.py main(): -m flag, launcher split, grid expansion,
    then compose every job. Returns (launcher, [ (overrides, cfg) ])."""
    words = shlex.split(command)
    assert words[:2] == ["python", "run.py"]
    overrides = words[2:]
    multirun = False
    for flag in ("-m", "--multirun"):
        if flag in overrides:
            overrides.remove(flag)
            multirun = True
    launcher, overrides = _pop_launcher(overrides)
    runs = _expand_multirun(overrides) if multirun else [overrides]
    return launcher, [
        (ovs, load_config(CONFIG_DIR, "train_eval", ovs)) for ovs in runs
    ]


def _get(cfg, dotted):
    node = cfg
    for part in dotted.split("."):
        node = node[part]
    return node


def test_readme_command_inventory():
    # the README publishes 29 run.py recipes (5 tune, 5 grid/best sweeps
    # per family, 14 ablations); extraction finding them all is itself
    # the parity check against README.md:148-422
    assert len(COMMANDS) == 29, COMMANDS


@pytest.mark.parametrize(
    "command", COMMANDS, ids=lambda c: " ".join(c.split()[2:5])
)
def test_readme_command_composes(command):
    launcher, jobs = _compose(command)
    assert jobs, command

    # the SLURM-cluster recipes carry launcher knobs; they must parse into
    # the launcher config, not leak into the run overrides
    if "hydra/launcher=slurm" in command:
        assert launcher is not None
        if "array_parallelism" in command:
            assert isinstance(launcher["array_parallelism"], int)
        if "exclude=" in command:
            assert str(launcher["exclude"]).startswith("cn")
    else:
        assert launcher is None

    for ovs, cfg in jobs:
        # every plain dotted override must LAND at its exact path with the
        # parsed (typed) value — group swaps/presets are exercised by the
        # loader itself
        for ov in ovs:
            key, _, raw = ov.partition("=")
            key = key.lstrip("+")
            if "/" in key or key in ("experiment", "search"):
                continue
            landed = _get(cfg, key)
            import yaml

            expect = yaml.safe_load(raw)
            if isinstance(expect, str):
                try:
                    expect = float(expect)
                except ValueError:
                    pass
            if isinstance(expect, float) and isinstance(
                landed, (int, float)
            ):
                assert float(landed) == pytest.approx(expect), ov
            else:
                assert landed == expect, ov

        # consumption spot-checks: the knobs the recipes sweep must reach
        # the builders, not just the config dict
        from w2v2_speaker_tpu.models.pooling import _POOL_FACTORY
        from w2v2_speaker_tpu.runtime.experiment import (
            _normalize_schedule_cfg,
            build_optimizer,
        )

        pool = cfg["network"].get("stat_pooling_type")
        if pool is not None:
            assert pool in _POOL_FACTORY, pool

        sched = _normalize_schedule_cfg(cfg["optim"]["schedule"])
        if "scheduler" in cfg["optim"]["schedule"]:
            # the reference's torch-shaped override path
            # (optim.schedule.scheduler.lr_lambda.initial_lr=...) must
            # alias onto the flat keys the builder reads
            nested = cfg["optim"]["schedule"]["scheduler"]["lr_lambda"]
            for k, v in nested.items():
                assert sched[k] == pytest.approx(v), k
        build_optimizer(cfg)  # schedule + algo must build

        if "tune_model=True" in command:
            assert cfg["tune_model"] is True
            assert cfg["tune_iterations"] == 5000
            assert cfg["trainer"]["auto_lr_find"] == "auto_lr_find"

        # 100_000-style underscore ints must parse as ints (YAML 1.1)
        assert isinstance(cfg["trainer"]["max_steps"], int)

        bs = cfg["data"]["dataloader"].get("train_batch_size")
        if bs is not None:
            assert isinstance(bs, int)


def test_readme_grid_shapes():
    """The sweep recipes expand to the reference's exact grid sizes."""
    sizes = {}
    for command in COMMANDS:
        _, jobs = _compose(command)
        sizes.setdefault(len(jobs), []).append(command)

    # 7- and 8-point lr grids, n=3/n=4 seed repeats, and the two
    # 3-seed x 10-pooling sweeps (30 jobs) from README.md:177-226
    assert any(
        "stat_pooling_type=mean," in c for c in sizes.get(30, [])
    ), sizes.keys()
    pooling_cmd = next(
        c for c in COMMANDS if "stat_pooling_type=mean," in c
    )
    _, jobs = _compose(pooling_cmd)
    pools = {cfg["network"]["stat_pooling_type"] for _, cfg in jobs}
    assert pools == {
        "mean", "mean+std", "attentive", "quantile", "first",
        "first+cls", "last", "middle", "random", "max",
    }
    seeds = {cfg["seed"] for _, cfg in jobs}
    assert len(seeds) == 3
    assert all(isinstance(s, int) for s in seeds)
