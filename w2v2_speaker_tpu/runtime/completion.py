"""Shell tab-completion for the mini-Hydra CLI.

The reference ships `preparation_scripts/hydra_bash_complete.sh`, which
installs Hydra's built-in bash completion by eval-ing
`python run.py -sc install=bash` (hydra 1.1's completion plugin). Same
contract here, implemented against this repo's config tree:

    eval "$(python run.py -sc install=bash)"

registers a bash function that calls back into `run.py -sc query=<word>`
for candidates:

- config-group swaps discovered from the config directory layout
  (`network=`, `optim.loss=`, `trainer=`, `hydra/launcher=`, ...), with
  their option stems as values,
- `+experiment=` / `+search=` global-package presets,
- dotted value overrides from the composed default config
  (`trainer.max_steps=`, `data.module.data_dir=`, ...).

Completion works for `python run.py ...`, `python predict.py ...` and the
scripts invoked directly.
"""

from __future__ import annotations

import pathlib
import sys
from typing import Dict, List, Tuple

__all__ = ["discover_groups", "candidates", "handle_shell_completion"]

# groups composed with a leading '+' in the reference's README commands
_PLUS_GROUPS = ("experiment", "search")


def discover_groups(
    config_dir: pathlib.Path,
) -> Dict[str, Tuple[str, List[str]]]:
    """Map each config group to its CLI spelling and option list.

    Keys are the normalized '/'-joined directory path; values are
    `(display_key, sorted option stems)` where display_key is the dotted
    spelling used on the command line (`optim.loss`), except the `hydra/*`
    groups which keep the reference's slash spelling (`hydra/launcher`).
    """
    groups: Dict[str, Tuple[str, List[str]]] = {}
    for d in sorted(p for p in config_dir.rglob("*") if p.is_dir()):
        opts = sorted(f.stem for f in d.glob("*.yaml"))
        if not opts:
            continue
        rel = d.relative_to(config_dir).parts
        norm = "/".join(rel)
        display = norm if rel[0] == "hydra" else ".".join(rel)
        groups[norm] = (display, opts)
    return groups


def _leaf_paths(tree: Dict, prefix: str = "") -> List[str]:
    out: List[str] = []
    for k, v in tree.items():
        if str(k).startswith("__"):
            continue  # composition-internal markers
        p = f"{prefix}{k}"
        if isinstance(v, dict) and v:
            out.extend(_leaf_paths(v, p + "."))
        else:
            out.append(p)
    return out


def candidates(
    config_dir: pathlib.Path, word: str, entry: str = "train_eval"
) -> List[str]:
    """Completion candidates for the partial override `word`."""
    groups = discover_groups(config_dir)

    if "=" in word:
        # complete the option of a group swap / preset
        key, _, prefix = word.partition("=")
        norm = key.strip().lstrip("+").replace(".", "/")
        if norm in groups:
            return [
                f"{key}={o}" for o in groups[norm][1] if o.startswith(prefix)
            ]
        return []

    cands = set()
    for norm, (display, _) in groups.items():
        plus = "+" if norm in _PLUS_GROUPS else ""
        cands.add(f"{plus}{display}=")
    # dotted value keys from the composed default config (unresolved: the
    # ${...} templates aren't needed to enumerate key paths)
    from .config import load_config

    try:
        cfg = load_config(
            config_dir, entry, [], resolve_interpolations=False
        )
        cands.update(p + "=" for p in _leaf_paths(cfg))
    except Exception:
        pass  # a broken tree still completes group names
    return sorted(c for c in cands if c.startswith(word))


_BASH_TEMPLATE = """\
# bash completion for {script_name} (mini-Hydra CLI). Install with:
#   eval "$(python {script_name} -sc install=bash)"
_w2v2_tpu_sc_{fn_suffix}() {{
  local script line cur prefix
  # works both for `python run.py ...` and `./run.py ...`
  case "${{COMP_WORDS[0]}}" in
    python*) script="${{COMP_WORDS[1]:-}}" ;;
    *) script="${{COMP_WORDS[0]}}" ;;
  esac
  # canonicalize so relative invocations of THIS project's scripts match
  if [[ "$script" == */* && -e "$script" ]]; then
    script="$(cd "${{script%/*}}" 2>/dev/null && pwd)/${{script##*/}}"
  fi
  case "$script" in
    run.py|predict.py) script="{script_dir}/$script" ;;
  esac
  # only ever execute THIS project's scripts — a foreign run.py must not
  # run on a TAB press; -o default falls back to filename completion
  case "$script" in
    "{script_dir}/run.py"|"{script_dir}/predict.py") ;;
    *) COMPREPLY=(); return 0 ;;
  esac
  # bash splits words at '=' (COMP_WORDBREAKS), so COMP_WORDS[COMP_CWORD]
  # loses the 'key=' prefix; recover the full current word from COMP_LINE
  line="${{COMP_LINE:0:COMP_POINT}}"
  cur="${{line##* }}"
  prefix=""
  case "$cur" in *=*) prefix="${{cur%=*}}=" ;; esac
  local IFS=$'\\n'
  COMPREPLY=( $("{python}" "$script" -sc "query=$cur" 2>/dev/null) )
  # strip through the last '=' so bash splices candidates after the
  # wordbreak instead of inserting 'key=key=option'
  COMPREPLY=( "${{COMPREPLY[@]#"$prefix"}}" )
}}
complete -o nospace -o default -F _w2v2_tpu_sc_{fn_suffix} \\
    python python3 run.py predict.py {script_path}
"""


def handle_shell_completion(
    config_dir: pathlib.Path,
    args: List[str],
    entry: str = "train_eval",
    script_path: str | None = None,
) -> None:
    """Dispatch `run.py -sc <mode>`: `install=bash` prints the completion
    script to eval; `query=<word>` prints candidates one per line."""
    mode = args[0] if args else ""
    key, _, val = mode.partition("=")
    if key == "install":
        if val != "bash":
            raise SystemExit(f"unsupported completion shell {val!r}")
        script = pathlib.Path(script_path or sys.argv[0]).absolute()
        print(
            _BASH_TEMPLATE.format(
                python=sys.executable,
                script_name=script.name,
                script_path=script,
                script_dir=script.parent,
                fn_suffix=script.stem.replace("-", "_"),
            )
        )
    elif key == "query":
        for c in candidates(config_dir, val, entry=entry):
            print(c)
    else:
        raise SystemExit(
            "usage: -sc install=bash | -sc query=<partial-override>"
        )
