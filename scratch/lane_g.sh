#!/bin/bash
# Lane G: n2exact reruns + SR retune + Li2O CISDTQ (sequential).
# Each rerun archives the superseded result first; a failed rerun restores
# the archived dir so RESULTS regeneration never loses a row.
cd /root/repo
ARCH=data/fleet_archive
mkdir -p $ARCH

for r in 0.9 1.2 1.35 1.5 1.65 2.25; do
  d=data/fleet/n2_$r
  a=$ARCH/n2_${r}_sampled
  if [ -d "$d" ] && [ ! -d "$a" ]; then mv "$d" "$a"; fi
  python -m experiments.fleet --phases n2exact --only n2_$r --stall-secs 600
  if [ ! -f "$d/summary.json" ] && [ -d "$a" ]; then
    echo "[laneG] n2_$r rerun failed; restoring sampled result"
    rm -rf "$d"; cp -r "$a" "$d"
  fi
done

d=data/fleet/opt_LiH_sr
a=$ARCH/opt_LiH_sr_overdamped
if [ -d "$d" ] && [ ! -d "$a" ]; then mv "$d" "$a"; fi
python -m experiments.fleet --phases optimizers --only opt_LiH_sr --stall-secs 600
if [ ! -f "$d/summary.json" ] && [ -d "$a" ]; then
  echo "[laneG] SR retune failed; restoring previous result"
  rm -rf "$d"; cp -r "$a" "$d"
fi

# Li2O CISDTQ-exact: host eigsh over 644k states is silent ~27 min
python -m experiments.fleet --phases zoo --only li2o_x4 --stall-secs 2400
echo "[laneG] all done"
