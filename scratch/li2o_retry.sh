#!/bin/bash
# Dedicated Li2O retry on a quiet chip: sort-fallback engine, modest initial
# sample count (avoids the deep overflow cascade), fast first output.
cd /root/repo
NAQS_TPU_RANK_MAX=16777216 timeout 3000 python -m naqs_tpu.cli -m Li2O \
  -n_train 3000 -s 11 -n_hid 64 -n_layer 1 -n_hid_phase 512 -n_layer_phase 2 \
  -single_phase -n_pretrain 20 -save_freq 250 -loadH -overwriteH \
  -n_samps 1e5 -n_unq_samps_min 1024 -n_unq_samps_max 16384 \
  -output_freq 5 -o data/fleet/zoo_Li2O -c
