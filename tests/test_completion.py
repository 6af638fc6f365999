"""Shell completion for the CLI (`run.py -sc ...` — the reference's
`preparation_scripts/hydra_bash_complete.sh` installs hydra's equivalent
built-in surface via `python run.py -sc install=bash`)."""

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

from w2v2_speaker_tpu.runtime.completion import candidates, discover_groups

CONFIG_DIR = REPO / "config"


def test_discover_groups_spellings():
    groups = discover_groups(CONFIG_DIR)
    assert "network" in groups and groups["network"][0] == "network"
    # nested groups get the dotted CLI spelling
    assert groups["optim/loss"][0] == "optim.loss"
    # hydra groups keep the reference's slash spelling
    assert groups["hydra/launcher"][0] == "hydra/launcher"
    assert "slurm" in groups["hydra/launcher"][1]
    assert "ecapa_tdnn" in groups["network"][1]


def test_complete_group_keys():
    cands = candidates(CONFIG_DIR, "netw")
    assert "network=" in cands
    # the composed default config's dotted keys complete too (hydra-like)
    assert "network.layerdrop=" in cands
    # experiment/search presets complete with their '+' prefix
    plus = candidates(CONFIG_DIR, "+")
    assert "+experiment=" in plus and "+search=" in plus


def test_complete_group_options():
    opts = candidates(CONFIG_DIR, "network=")
    assert "network=ecapa_tdnn" in opts
    assert "network=wav2vec2_fc" in opts
    assert candidates(CONFIG_DIR, "network=ecapa") == ["network=ecapa_tdnn"]
    # nested group, dotted spelling
    assert "optim.loss=aam_softmax" in candidates(CONFIG_DIR, "optim.loss=")
    # '+' prefix is preserved in the completed token
    exp = candidates(CONFIG_DIR, "+experiment=speaker_wav2vec2_a")
    assert "+experiment=speaker_wav2vec2_aam" in exp
    assert all(c.startswith("+experiment=") for c in exp)
    # unknown group: no candidates (bash falls back to nothing)
    assert candidates(CONFIG_DIR, "nosuchgroup=") == []


def test_complete_dotted_value_keys():
    cands = candidates(CONFIG_DIR, "trainer.max_")
    assert "trainer.max_steps=" in cands
    assert "data.module.data_dir=" in candidates(CONFIG_DIR, "data.module.data_d")


def test_run_py_sc_surface(capsys):
    import run as run_cli

    run_cli.main(["-sc", "query=network="])
    out = capsys.readouterr().out.splitlines()
    assert "network=ecapa_tdnn" in out

    run_cli.main(["-sc", "install=bash"])
    script = capsys.readouterr().out
    assert "complete -o nospace -o default -F" in script
    assert "run.py" in script and "-sc" in script

    with pytest.raises(SystemExit):
        run_cli.main(["-sc", "install=zsh"])


def test_predict_py_sc_surface(capsys):
    import predict as predict_cli

    predict_cli.main(["-sc", "query=evaluator="])
    out = capsys.readouterr().out.splitlines()
    assert any(c.startswith("evaluator=cosine_distance") for c in out)


# ------------------------------------------------- real-bash TAB semantics

def _bash_complete(words, cword, line):
    """Run the generated completion function inside a real bash with the
    COMP_* state an actual TAB press produces (bash splits words at '='
    per COMP_WORDBREAKS) and return COMPREPLY."""
    import subprocess

    quoted = " ".join(f"'{w}'" for w in words)
    harness = f"""
set -e
eval "$('{sys.executable}' '{REPO}/run.py' -sc install=bash)"
COMP_WORDS=({quoted})
COMP_CWORD={cword}
COMP_LINE='{line}'
COMP_POINT={len(line)}
_w2v2_tpu_sc_run
printf '%s\\n' "${{COMPREPLY[@]}}"
"""
    out = subprocess.run(
        ["bash", "-c", harness], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr
    return [l for l in out.stdout.splitlines() if l]


def test_bash_tab_completes_group_option():
    # `python run.py network=eca<TAB>`: bash splits at '=', so COMP_WORDS
    # is (python run.py network = eca); candidates must come back WITHOUT
    # the 'network=' prefix or bash would splice 'network=network=ecapa...'
    replies = _bash_complete(
        ["python", f"{REPO}/run.py", "network", "=", "eca"],
        4,
        f"python {REPO}/run.py network=eca",
    )
    assert replies == ["ecapa_tdnn"]


def test_bash_tab_completes_group_key():
    replies = _bash_complete(
        ["python", f"{REPO}/run.py", "netw"],
        2,
        f"python {REPO}/run.py netw",
    )
    assert "network=" in replies


def test_bash_tab_bare_script_name_resolves_to_repo():
    # `python run.py ...` typed with the bare name maps onto THIS repo's
    # run.py (never executes a same-named foreign script)
    replies = _bash_complete(
        ["python", "run.py", "network", "=", "eca"],
        4,
        "python run.py network=eca",
    )
    assert replies == ["ecapa_tdnn"]


def test_bash_tab_foreign_script_is_not_executed(tmp_path):
    # a foreign ./run.py must not be invoked on TAB: the function bails
    # with empty COMPREPLY (-o default then falls back to filenames)
    foreign = tmp_path / "run.py"
    foreign.write_text(f"open('{tmp_path}/executed', 'w')\n")
    replies = _bash_complete(
        ["python", str(foreign), "netw"],
        2,
        f"python {foreign} netw",
    )
    assert replies == []
    assert not (tmp_path / "executed").exists()
