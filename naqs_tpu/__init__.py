"""naqs_tpu: a TPU-native neural autoregressive quantum states (NAQS) framework.

A from-scratch JAX/XLA re-design of variational Monte Carlo for ab initio
quantum chemistry with autoregressive neural wavefunctions (the capability
set of tomdbar/naqs-for-quantum-chemistry, re-architected for TPU), with an
optional Pallas kernel for the membership-lookup hot op (ops/dyn_gather;
interpret-validated — the tunneled axon backend used for CI cannot lower
pallas_call, so the production engine rides XLA, measured at 1 G rows/s).

Design pillars (vs. the reference PyTorch+Cython implementation):
  * States are packed uint64 bitstrings; all hot math is bitwise/XLA-fused.
  * The Jordan-Wigner local-energy engine is gather/parity based — no
    materialized sparse Hamiltonian matrix on the hot path. Small sectors
    run the dense sector-grid engine (ops/dense_engine): coupled-state
    lookups become STATIC permutation row-gathers over the full
    combinadic grid, and the per-mask Hamiltonian values precompute into
    one static tensor.
  * The autoregressive sampler is a jitted ``lax.scan`` over orbital shells
    with fixed-capacity unique-state buffers (no ragged host loops).
  * All per-shell conditionals evaluate as one stacked (shell-vmapped)
    dense network — a single MXU-friendly einsum instead of a ModuleList
    of ragged MLPs.
  * Scale-out is a 1-D ``jax.sharding.Mesh`` over the unique-sample batch
    with ``shard_map`` + ``psum`` collectives.
"""

import jax as _jax

# Chemistry-grade energies need f64 accumulations (|E| ~ 5e2 Ha resolved to
# ~1e-4 Ha). Model compute stays explicitly f32; only reductions are f64.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from naqs_tpu.utils.molecule import Molecule, load_molecule  # noqa: E402,F401
from naqs_tpu.hamiltonian import PauliTerms, compile_pauli_terms  # noqa: E402,F401
from naqs_tpu.utils.hilbert import Hilbert  # noqa: E402,F401


def __getattr__(name):
    # lazy top-level conveniences (avoid importing flax/optax at package import)
    if name in ("NAQSConfig", "init_params", "log_psi"):
        from naqs_tpu.models import nade

        return getattr(nade, name)
    if name in ("VMCTrainer", "TrainConfig"):
        from naqs_tpu import trainer

        return getattr(trainer, name)
    if name in ("sample", "sample_density", "SampleBatch"):
        from naqs_tpu import sampler

        return getattr(sampler, name)
    raise AttributeError(f"module 'naqs_tpu' has no attribute '{name}'")
