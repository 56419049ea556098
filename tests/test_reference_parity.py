"""Numerical parity with the reference PyTorch model (weight-for-weight).

The reference's network layer (src/naqs/network/) is pure torch — no Cython —
so we can instantiate it, copy its weights into our stacked parameter
layout, and demand identical conditional tables and log-amplitudes.
This pins down the masking, spin-symmetrization and phase semantics exactly.

Skipped when torch or the reference checkout is unavailable.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REF)
    try:
        from src.naqs.network.base import InputEncoding, NadeMasking  # noqa
        from src.naqs.network.nade import (  # noqa
            ComplexAutoregressiveMachine1D_OrbitalNade,
        )
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference model import failed: {exc}")
    return sys.modules["src.naqs.network.nade"], sys.modules["src.naqs.network.base"]


def _copy_weights(ref_model, cfg, params):
    """Copy reference per-shell MLP weights into our stacked layout."""
    import jax.numpy as jnp

    s = cfg.n_shells
    params = {k: v for k, v in params.items()}
    amp = [dict(l) for l in params["amp"]]
    phase = [dict(l) for l in params["phase"]]

    for j, block in enumerate(ref_model.amp_layers):
        linears = [m for m in block.layers.modules() if isinstance(m, torch.nn.Linear)]
        for li, lin in enumerate(linears):
            w = lin.weight.detach().numpy()  # (out, in)
            b = lin.bias.detach().numpy()
            if li == 0:
                wj = np.zeros((cfg.in_width, w.shape[0]), np.float32)
                if j > 0:
                    wj[:j, :] = w[:, :j].T           # first (alpha) substring
                    wj[s - 1:s - 1 + j, :] = w[:, j:2 * j].T  # second substring
                # j == 0: reference feeds a zero input; weights never matter
            else:
                wj = w.T
            amp[li]["w"] = amp[li]["w"].at[j].set(jnp.asarray(wj))
            amp[li]["b"] = amp[li]["b"].at[j].set(jnp.asarray(b))

    for pj, block in enumerate(ref_model.phase_layers):
        j = pj if cfg.aggregate_phase else 0
        shell = pj if cfg.aggregate_phase else s - 1  # input width of source shell
        linears = [m for m in block.layers.modules() if isinstance(m, torch.nn.Linear)]
        for li, lin in enumerate(linears):
            w = lin.weight.detach().numpy()
            b = lin.bias.detach().numpy()
            if li == 0:
                wj = np.zeros((cfg.in_width, w.shape[0]), np.float32)
                if shell > 0:
                    wj[:shell, :] = w[:, :shell].T
                    wj[s - 1:s - 1 + shell, :] = w[:, shell:2 * shell].T
            else:
                wj = w.T
            phase[li]["w"] = phase[li]["w"].at[j].set(jnp.asarray(wj))
            phase[li]["b"] = phase[li]["b"].at[j].set(jnp.asarray(b))

    params["amp"] = amp
    params["phase"] = phase
    return params


@pytest.mark.parametrize(
    "masking_name,aggregate_phase,use_amp_sym",
    [
        ("PARTIAL", False, True),
        ("FULL", False, True),
        ("PARTIAL", True, True),
        ("PARTIAL", False, False),
        ("NONE", False, True),
    ],
)
def test_log_psi_matches_reference_model(
    ref_modules, masking_name, aggregate_phase, use_amp_sym
):
    nade_mod, base_mod = ref_modules
    import jax
    import jax.numpy as jnp

    from naqs_tpu.models.nade import NAQSConfig, init_params, log_psi, shell_tables
    from naqs_tpu.utils.bits import np_pack_bits

    n_qubits, n_alpha, n_beta = 8, 2, 1
    masking = getattr(base_mod.NadeMasking, masking_name)

    torch.manual_seed(0)
    ref = nade_mod.ComplexAutoregressiveMachine1D_OrbitalNade(
        num_qubits=n_qubits,
        n_alpha_electrons=n_alpha,
        n_beta_electrons=n_beta,
        masking=masking,
        amp_hidden_size=[16],
        phase_hidden_size=[16],
        use_amp_spin_sym=use_amp_sym,
        use_phase_spin_sym=False,
        aggregate_phase=aggregate_phase,
        combined_amp_phase_blocks=False,
        device="cpu",
    )
    ref.predict()

    cfg = NAQSConfig(
        n_qubits=n_qubits,
        sectors=((n_alpha, n_beta),),
        masking=masking_name.lower(),
        amp_hidden=(16,),
        phase_hidden=(16,),
        use_amp_spin_sym=use_amp_sym,
        use_phase_spin_sym=False,
        aggregate_phase=aggregate_phase,
        shell_order=tuple(range(n_qubits // 2)),  # identity: compare raw
    )
    params = init_params(jax.random.key(0), cfg)
    params = _copy_weights(ref, cfg, params)

    # evaluate on every valid state (and, for NONE masking, random states too)
    import naqs_tpu as nq

    h = nq.Hilbert(n_qubits=n_qubits, sectors=((n_alpha, n_beta),))
    states_bits = (
        np.stack([(h.basis >> np.uint64(q)) & np.uint64(1) for q in range(n_qubits)], 1)
    ).astype(np.float64)
    x_ref = torch.tensor(2.0 * states_bits - 1.0)  # signed encoding

    with torch.no_grad():
        tables_ref = ref(x_ref).numpy()  # (B, S, 4, 2)

    la_tab, ph_tab = shell_tables(cfg, params, jnp.asarray(h.basis))
    la_tab = np.asarray(la_tab)
    ref_amp = tables_ref[..., 0]
    finite = np.isfinite(ref_amp)  # reference uses -inf where we use -5e8
    np.testing.assert_allclose(
        la_tab[finite], ref_amp[finite], atol=2e-5,
        err_msg="amplitude conditional tables diverge from reference",
    )
    if (~finite).any():
        assert la_tab[~finite].max() < -1e8  # masked -> amplitude exp -> 0
    np.testing.assert_allclose(
        np.asarray(ph_tab), tables_ref[..., 1], atol=2e-5,
        err_msg="phase conditional tables diverge from reference",
    )

    # gathered + summed log psi
    occ = (states_bits[:, 0::2] + 2 * states_bits[:, 1::2]).astype(int)
    la_ref = np.take_along_axis(tables_ref[..., 0], occ[..., None], 2)[..., 0].sum(1)
    ph_ref = np.take_along_axis(tables_ref[..., 1], occ[..., None], 2)[..., 0].sum(1)
    la, ph = log_psi(cfg, params, jnp.asarray(h.basis))
    np.testing.assert_allclose(np.asarray(la), la_ref, atol=5e-5)
    np.testing.assert_allclose(np.asarray(ph), ph_ref, atol=5e-5)
