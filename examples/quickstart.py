"""Runnable quick-start: the TPU-native equivalent of the reference's
run_naqs.ipynb (train LiH to chemical accuracy, then refine with the
sampled-subspace FCI solve).

    JAX_PLATFORMS=cpu python examples/quickstart.py       # ~2 min on CPU
    python examples/quickstart.py                          # one TPU chip
"""

import naqs_tpu as nq
from naqs_tpu.models.nade import NAQSConfig
from naqs_tpu.trainer import TrainConfig, VMCTrainer


def main():
    mol = nq.load_molecule("LiH")
    print(f"{mol.name}: {mol.n_qubits} qubits, {mol.n_electrons} electrons")
    print(f"  HF  {mol.hf_energy:.6f}  CCSD {mol.ccsd_energy:.6f}  "
          f"FCI {mol.fci_energy:.6f}")

    hilbert = nq.Hilbert.for_molecule(mol)
    terms = nq.compile_pauli_terms(mol.qubit_hamiltonian, mol.n_qubits)

    cfg = NAQSConfig(
        n_qubits=mol.n_qubits, sectors=hilbert.sectors,
        amp_hidden=(64,), phase_hidden=(512, 512),
    )
    trainer = VMCTrainer(
        cfg, terms, hilbert,
        TrainConfig(n_train=1500, n_samples=1e6, seed=11,
                    n_unq_samples_min=64, n_unq_samples_max=1024),
    )
    trainer.pre_flatten(20)
    trainer.run(1500, output_freq=100, log_exact_energy=False)

    e = trainer.exact_energy()
    e_fci_sub, n_sub = trainer.solve_h()
    print(f"\nVMC energy      {e:.6f} Ha  ({1e3*(e-mol.fci_energy):+.3f} mHa "
          f"vs FCI)")
    print(f"VMC+FCI (n={n_sub}) {e_fci_sub:.6f} Ha  "
          f"({1e3*(e_fci_sub-mol.fci_energy):+.3f} mHa vs FCI)")
    assert e - mol.fci_energy < 1.6e-3, "did not reach chemical accuracy"
    print("chemical accuracy: yes")


if __name__ == "__main__":
    main()
