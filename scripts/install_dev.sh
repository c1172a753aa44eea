#!/usr/bin/env bash
# Make gpudrive_lab_tpu importable from any cwd without touching PYTHONPATH
# (a naive PYTHONPATH=/root/repo overwrite breaks the axon TPU plugin's
# /root/.axon_site registration — see CLAUDE.md "Environment traps").
# A .pth file in site-packages appends the repo to sys.path process-wide,
# which is equivalent to `pip install -e .` minus the network-touching
# build step this environment forbids.
set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$(pwd)"
SITE="$(python -c 'import site; print(site.getsitepackages()[0])')"
echo "$REPO" > "$SITE/gpudrive_lab_tpu_dev.pth"
echo "wrote $SITE/gpudrive_lab_tpu_dev.pth -> $REPO"
python -c 'import gpudrive_lab_tpu; print("import ok:", gpudrive_lab_tpu.__file__)'
