#!/bin/bash
# End-to-end smoke run of every CLI entry point with tiny inputs
# (reference test.sh:4-23 — "does every stage run without crashing").
set -e

DEVICE="${DEVICE:-cpu}"
N_INPUTS="${N_INPUTS:-10}"
MODEL_IDX="${MODEL_IDX:-0}"
SAVEDIR="TESTS"
export ROBUSTBNNS_DATA_FALLBACK=synthetic

OUT_DIR="tests_out/$(date +%Y-%m-%d)"
mkdir -p "$OUT_DIR"
OUT="${OUT_DIR}/$(date +%H:%M:%S)_smoke.txt"

{
python3 -m robustbnns_tpu.cli.train_nn       --n_inputs=$N_INPUTS --model_idx=$MODEL_IDX --train=True --test=True --savedir=$SAVEDIR --device=$DEVICE
python3 -m robustbnns_tpu.cli.train_bnn      --n_inputs=$N_INPUTS --model_idx=$MODEL_IDX --train=True --test=True --savedir=$SAVEDIR --device=$DEVICE

python3 -m robustbnns_tpu.cli.loss_gradients --n_inputs=$N_INPUTS --model_idx=$MODEL_IDX --savedir=$SAVEDIR --device=$DEVICE
python3 -m robustbnns_tpu.cli.gradients_components --heatmaps=False --stripplot=True --compute_grads=True --n_inputs=$N_INPUTS --model_idx=$MODEL_IDX --savedir=$SAVEDIR --device=$DEVICE

python3 -m robustbnns_tpu.cli.attacks --attack_method="fgsm" --attack=True --n_inputs=$N_INPUTS --model_idx=$MODEL_IDX --train=False --test=False --savedir=$SAVEDIR --device=$DEVICE
python3 -m robustbnns_tpu.cli.attacks --attack_method="pgd"  --attack=True --n_inputs=$N_INPUTS --model_idx=$MODEL_IDX --train=False --test=False --savedir=$SAVEDIR --device=$DEVICE

# Sharded variant: the same train+attack pipeline SPMD over a (data=4,
# sample=2) mesh — 8 virtual CPU devices stand in for an 8-chip slice.
# model_5 (mnist fc2-512 SVI): the fc path compiles in seconds on the host
# CPU; the conv path's SPMD compile takes minutes/vCPU and has its own
# hardware bench coverage.
MODEL_IDX_SHARDED="${MODEL_IDX_SHARDED:-5}"
echo "=== sharded (mesh=4x2) variant ==="
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python3 -m robustbnns_tpu.cli.train_bnn --n_inputs=$N_INPUTS --model_idx=$MODEL_IDX_SHARDED --train=True --test=True --savedir=$SAVEDIR --device=cpu --mesh=4x2
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python3 -m robustbnns_tpu.cli.attacks --model_type=bnn --attack_method="fgsm" --attack=True --n_inputs=$N_INPUTS --model_idx=$MODEL_IDX_SHARDED --train=False --test=False --savedir=$SAVEDIR --device=cpu --mesh=4x2
} 2>&1 | tee "$OUT"

echo "smoke test OK — log at $OUT"
