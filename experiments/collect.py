"""Aggregate run summaries into a results table.

Usage:
    python -m experiments.collect data/naqs [more dirs...] [--json out.json]
Scans for summary.json files and prints a markdown table with
chemical-accuracy verdicts.
"""

from __future__ import annotations

import argparse
import json
import os


def collect(dirs):
    rows = []
    for d in dirs:
        for root, _, files in os.walk(d):
            if "summary.json" in files:
                with open(os.path.join(root, "summary.json")) as f:
                    s = json.load(f)
                s["run_dir"] = root
                rows.append(s)
    return sorted(rows, key=lambda r: (r.get("molecule", ""), r.get("seed", 0)))


def to_markdown(rows) -> str:
    hdr = ("| molecule | seed | E (exact) | E_loc min (smoothed) | VMC+FCI | FCI "
           "| E-FCI (mHa) | chem acc |")
    sep = "|" + "---|" * 8
    out = [hdr, sep]
    for r in rows:
        e = r.get("e_exact_final", r.get("e_loc_trailing_mean",
                                         r.get("e_loc_smoothed_min")))
        fci = r.get("fci_energy")
        delta = (e - fci) * 1e3 if (e is not None and fci is not None) else None
        out.append(
            f"| {r.get('molecule','?')} | {r.get('seed','?')} "
            f"| {_f(r.get('e_exact_final'))} | {_f(r.get('e_loc_smoothed_min'))} "
            f"| {_f(r.get('e_vmc_fci_subspace'))} | {_f(fci)} "
            f"| {_f(delta, 3)} | {r.get('vmc_chem_acc', '?')} |"
        )
    return "\n".join(out)


def _f(x, p=6):
    return f"{x:.{p}f}" if isinstance(x, (int, float)) else "-"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dirs", nargs="+")
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)
    rows = collect(args.dirs)
    print(to_markdown(rows))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    main()
