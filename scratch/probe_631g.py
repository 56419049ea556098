"""Probe: published 6-31G primitive tables vs stored Psi4 baselines."""
import numpy as np
from naqs_tpu.chem.integrals import ContractedGaussian, build_integrals
from naqs_tpu.chem import scf

ANG2BOHR = 1.0 / 0.52917721067

H_631G = [  # (l, [(exp, coeff)...])
    (0, [(18.7311370, 0.03349460), (2.8253937, 0.23472695), (0.6401217, 0.81375733)]),
    (0, [(0.1612778, 1.0)]),
]

def build(shells, center):
    out = []
    for l, prims in shells:
        alphas = np.array([a for a, _ in prims])
        coeffs = np.array([c for _, c in prims])
        if l == 0:
            out.append(ContractedGaussian(center, (0, 0, 0), alphas, coeffs))
        elif l == 1:
            for lmn in ((1,0,0),(0,1,0),(0,0,1)):
                out.append(ContractedGaussian(center, lmn, alphas, coeffs))
    return out

centers = np.array([[2.0,0,0],[3.0,0,0]]) * ANG2BOHR
basis = build(H_631G, centers[0]) + build(H_631G, centers[1])
charges = np.array([1.0, 1.0])
s, t, v, g = build_integrals(basis, charges, centers)
# minimal RHF via scf internals
import inspect
print([n for n,_ in inspect.getmembers(scf, inspect.isfunction)])
