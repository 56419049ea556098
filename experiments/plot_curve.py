"""Render the N2 dissociation curve from fleet results.

The reference paper's headline figure (N2_energy_surface.sh): NAQS energies
vs HF/MP2/CCSD/FCI across 11 bond lengths, with the strong-correlation
regime where CCSD/MP2 go non-variational. Reads data/fleet/n2_*/summary.json.

Usage:
    python -m experiments.plot_curve [--out n2_curve.png] [--dirs data/fleet]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re


def load_points(root: str):
    pts = []
    for path in sorted(glob.glob(os.path.join(root, "n2_*", "summary.json"))):
        m = re.search(r"n2_([0-9.]+)", path)
        if not m:
            continue
        with open(path) as f:
            s = json.load(f)
        import math
        e = None
        for key in ("e_exact_final", "e_loc_trailing_mean",
                    "e_vmc_fci_subspace"):
            v = s.get(key)
            if v is not None and math.isfinite(v):
                e = v
                break
        pts.append({
            "r": float(m.group(1)),
            "naqs": e,
            "naqs_fci": s.get("e_vmc_fci_subspace"),
            "hf": s.get("hf_energy"),
            "ccsd": s.get("ccsd_energy"),
            "fci": s.get("fci_energy"),
        })
    return sorted(pts, key=lambda p: p["r"])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dirs", default="data/fleet")
    p.add_argument("--out", default="data/fleet/n2_curve.png")
    args = p.parse_args(argv)
    pts = load_points(args.dirs)
    if not pts:
        print("no n2_* summaries found")
        return []

    print("| r (A) | NAQS | NAQS+FCI | HF | CCSD | FCI | E-FCI (mHa) |")
    print("|" + "---|" * 7)
    for q in pts:
        d = (q["naqs"] - q["fci"]) * 1e3 if q["naqs"] and q["fci"] else None
        print(f"| {q['r']} | {q['naqs']:.6f} | {q['naqs_fci']:.6f} "
              f"| {q['hf']:.6f} | {q['ccsd']:.6f} | {q['fci']:.6f} "
              f"| {d:.3f} |")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception as exc:
        print(f"(matplotlib unavailable: {exc})")
        return pts

    rs = [q["r"] for q in pts]
    fig, (ax, ax2) = plt.subplots(
        2, 1, figsize=(7, 8), sharex=True,
        gridspec_kw={"height_ratios": [2.2, 1]},
    )
    ax.plot(rs, [q["hf"] for q in pts], "s--", label="HF", color="#999")
    ax.plot(rs, [q["ccsd"] for q in pts], "^--", label="CCSD", color="#e8a33d")
    ax.plot(rs, [q["fci"] for q in pts], "k-", label="FCI", lw=1.5)
    ax.plot(rs, [q["naqs"] for q in pts], "o", label="NAQS (this work)",
            color="#3d6fe8", ms=6)
    ax.set_ylabel("Energy (Ha)")
    ax.legend()
    ax.set_title("N2/sto-3g dissociation: NAQS-TPU vs classical methods")

    d_naqs = [(q["naqs"] - q["fci"]) * 1e3 for q in pts]
    d_ccsd = [(q["ccsd"] - q["fci"]) * 1e3 for q in pts]
    ax2.axhspan(-1.6, 1.6, color="#3d6fe8", alpha=0.12,
                label="chemical accuracy")
    ax2.axhline(0, color="k", lw=0.8)
    ax2.plot(rs, d_ccsd, "^--", color="#e8a33d", label="CCSD - FCI")
    ax2.plot(rs, d_naqs, "o", color="#3d6fe8", label="NAQS - FCI")
    ax2.set_xlabel("Bond length (Angstrom)")
    ax2.set_ylabel("E - FCI (mHa)")
    ax2.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"saved {args.out}")
    return pts


if __name__ == "__main__":
    main()
