"""Batch experiment runner — the reference's bash fleet, as one module.

Reproduces the reference's experiment suites (experiments/bash/naqs/*.sh):
  * batch_train: 5-seed production runs per molecule (seeds 111..555)
  * ablations: no-masking / full-masking / no-amp-sym variants
  * n2_surface: the 11-point N2 dissociation curve
  * carleo_comps: the Choo-et-al.-comparison geometries

Usage:
    python -m experiments.sweep batch_train -m LiH BeH2 -n_train 10000
    python -m experiments.sweep n2_surface
    python -m experiments.sweep ablations -m H2O
"""

from __future__ import annotations

import argparse
import sys

from naqs_tpu.cli import run as cli_run

SEEDS = [111, 222, 333, 444, 555]

# reference production hyperparameters (batch_train.sh:14)
PROD = ["-n_layer", "1", "-n_hid", "64", "-n_layer_phase", "2",
        "-n_hid_phase", "512", "-single_phase"]

N2_CURVE = [f"N2_{r}" for r in
            ["0.75", "0.9", "1.05", "1.2", "1.35", "1.5",
             "1.65", "1.8", "1.95", "2.1", "2.25"]]

CARLEO = ["carleo/H2", "carleo/LiH", "carleo/H2O", "carleo/NH3",
          "carleo/C2", "carleo/N2", "carleo/H2O_6-31G"]

ABLATIONS = {
    "baseline": [],
    "no_mask": ["-no_mask_psi"],
    "full_mask": ["-full_mask_psi"],
    "no_amp_sym": ["-no_amp_sym"],
    "full_mask_no_amp_sym": ["-full_mask_psi", "-no_amp_sym"],
}


def _run_one(molecule, seed, extra, passthrough):
    args = ["-m", molecule, "-s", str(seed)] + PROD + extra + passthrough
    print(f"\n=== {molecule} seed={seed} {' '.join(extra)} ===", flush=True)
    return cli_run(args)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("suite", choices=["batch_train", "ablations", "n2_surface",
                                     "carleo_comps"])
    p.add_argument("-m", "--molecules", nargs="*", default=["LiH"])
    p.add_argument("--seeds", nargs="*", type=int, default=SEEDS)
    args, passthrough = p.parse_known_args(argv)

    results = {}
    if args.suite == "batch_train":
        for mol in args.molecules:
            for seed in args.seeds:
                results[(mol, seed)] = _run_one(mol, seed, [], passthrough)
    elif args.suite == "ablations":
        for mol in args.molecules:
            for name, extra in ABLATIONS.items():
                results[(mol, name)] = _run_one(mol, args.seeds[0], extra, passthrough)
    elif args.suite == "n2_surface":
        for mol in N2_CURVE:
            results[mol] = _run_one(mol, args.seeds[0], [], passthrough)
    elif args.suite == "carleo_comps":
        for mol in CARLEO:
            results[mol] = _run_one(mol, args.seeds[0], [], passthrough)
    return results


if __name__ == "__main__":
    main()
