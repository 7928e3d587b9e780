#!/usr/bin/env bash
# Launch training (parity with the reference's torchrun launcher,
# valley/train/train.sh).  JAX is single-process-per-host: on one TPU VM
# this single process drives every local chip through the mesh; on a
# multi-host slice, run the same command on every host (e.g. with
# `gcloud compute tpus tpu-vm ssh --worker=all`) after setting the usual
# JAX distributed env (coordinator address via megascale / jax.distributed).
#
# usage: bash valley_tpu/train/train.sh <experiment.yaml>
set -euo pipefail
python -m valley_tpu.train.train --conf "$1"
