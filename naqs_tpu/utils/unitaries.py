"""Single-qubit measurement-basis rotations over packed states.

Parity component for the reference's Unitaries bookkeeping
(src/utils/hilbert.py:903-998, unused on its main path): expands a state
measured with some qubits rotated into the X or Y basis into the
computational-basis superposition it represents.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# single-qubit change-of-basis rows: basis[b] of H/S^dagger-H acting on |b>
_H = np.array([[1, 1], [1, -1]], dtype=np.complex128) / np.sqrt(2)  # X basis
_SH = np.array([[1, 1], [1j, -1j]], dtype=np.complex128).conj().T / np.sqrt(2)  # Y


def rotate_state(
    state: int, bases: Dict[int, str]
) -> Tuple[np.ndarray, np.ndarray]:
    """Expand a packed state measured in rotated bases.

    bases: {qubit: 'X'|'Y'|'Z'}; Z entries are ignored. Returns
    (states, amplitudes): the 2^k computational-basis states and their
    amplitudes, where k is the number of rotated qubits.
    """
    rot = [(q, b) for q, b in sorted(bases.items()) if b in ("X", "Y")]
    states = np.array([np.uint64(state)], dtype=np.uint64)
    amps = np.array([1.0 + 0j])
    for q, b in rot:
        u = _H if b == "X" else _SH
        bit = np.uint64(1) << np.uint64(q)
        measured = ((states & bit) != 0).astype(int)
        base0 = states & ~bit
        new_states = np.concatenate([base0, base0 | bit])
        new_amps = np.concatenate(
            [amps * u[measured, 0], amps * u[measured, 1]]
        )
        states, amps = new_states, new_amps
    order = np.argsort(states)
    return states[order], amps[order]
