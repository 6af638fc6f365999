#!/usr/bin/env bash
# Install the TPU compute stack (the reference's
# preparation_scripts/set_cuda_dependencies.sh role — there it pins the
# torch+CUDA wheel set; here the accelerator stack is jax[tpu]).
#
# Run ON the TPU VM, inside the project virtualenv. Safe to re-run.
set -euo pipefail

# jax[tpu] pulls the matching libtpu from Google's release index
pip install -U "jax[tpu]" \
  -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# framework deps (model/state/config layers)
pip install -U flax optax orbax-checkpoint chex einops numpy pyyaml

# optional: torch (CPU wheel) is only needed for converting HF/fairseq
# checkpoints with preparation/download_pretrained_models.py
pip install -U --index-url https://download.pytorch.org/whl/cpu torch || \
  echo "torch (cpu) install failed — only needed for checkpoint conversion"

# sanity check: the chips must enumerate
python - <<'EOF'
import jax

devices = jax.devices()
print(f"jax {jax.__version__}: {len(devices)} device(s)")
for d in devices:
    print(f"  {d.device_kind} id={d.id}")
assert devices, "no accelerator devices visible"
EOF
