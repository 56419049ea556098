#!/bin/bash
# Extend each seeds_N2 run by 3000 polish steps at the second-phase LR
# (direct E ended ~+2.5 mHa at 6000 steps; the VMC+FCI column is already
# chem acc). Uses the chip while li2o_ws is in its host-eigsh window.
cd /root/repo
for s in 111 222 333 444 555; do
  d=data/fleet/seeds_N2_$s
  mv $d/summary.json $d/summary_6k.json 2>/dev/null
  timeout 2400 python -m naqs_tpu.cli -m N2 -n_train 9000 -s $s \
    -n_hid 64 -n_layer 1 -n_hid_phase 512 -n_layer_phase 2 -single_phase \
    -save_freq 500 -loadH -n_samps 1e7 -n_unq_samps_min 256 \
    -n_unq_samps_max 4096 -o $d -c >> $d/fleet_log.txt 2>&1
  if [ ! -f $d/summary.json ]; then
    echo "[laneM] seeds_N2_$s extension failed; restoring 6k summary"
    cp $d/summary_6k.json $d/summary.json
  fi
done
echo "[laneM] done"
