# Tab completion for the run.py / predict.py CLIs (the reference's
# preparation_scripts/hydra_bash_complete.sh role — there it installs
# hydra's built-in completion plugin; here the mini-Hydra provides the
# same `-sc` surface natively).
#
# This file must be SOURCED from an interactive bash session, not executed:
#
#   source preparation/shell_completion.sh
#
# After sourcing, `python run.py net<TAB>` completes config groups
# (`network=`), group options (`network=ecapa_tdnn`), presets
# (`+experiment=speaker_wav2vec2_aam`) and dotted value overrides
# (`trainer.max_steps=`).
eval "$(python "$(dirname "${BASH_SOURCE[0]}")/../run.py" -sc install=bash)"
