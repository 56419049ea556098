"""Orbital-wise autoregressive NAQS ansatz, TPU-first.

The wavefunction factorizes over spatial-orbital "shells" (pairs of
spin-qubits): psi(s) = prod_i psi_i(occ_i | occ_<i), occ in {00, a, b, ab}.
Per shell there is an amplitude head (masked log-softmax over 4 occupations,
optionally spin-exchange-symmetrized from 5 logits) and a phase head.

TPU-first re-design vs. the reference (src/naqs/network/nade.py:157-777):
the reference keeps N/2 independent ragged MLPs (shell i has 2i inputs) and
walks them in a Python loop. Here every shell's input is zero-padded to the
common width 2(S-1) and all shells evaluate as ONE stacked einsum over
(batch, shell, features) with per-shell weight tensors — shells are
independent given the input (NADE, not RNN), so the full conditional table
for a batch of states is a single fused MXU pass, no sequential loop.
Zero-padding is exact: padded inputs are 0 (the live values are signed +-1),
so padded weights never contribute.

Semantics preserved from the reference:
  * spin-exchange symmetry: canonical ordering of (alpha, beta) substrings
    and 5-logit symmetrization (nade.py:503-594),
  * hard electron-number masks over the 4 occupations (nade.py:417-501),
    with multi-sector (open-shell) union masks,
  * masking modes none/partial/full (partial leaves the last shell
    unmasked; nade.py:612-630),
  * phase modes: per-shell aggregated phases or one global phase net on the
    final shell (nade.py:556-567), optional phase spin symmetry with the
    pi * (N_01 mod 2) exchange phase shift (nade.py:597-610),
  * shell ordering permutations (wavefunction.py:369-383; default reversed).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Literal, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from naqs_tpu.utils.bits import unpack_bits

# masked-logit value; exp(x/2) underflows to 0. A host scalar, NOT jnp:
# a module-level device array would initialize the XLA backend at import
# time and break jax.distributed.initialize in multi-host runs.
BIG_NEG = np.float32(-1e9)


# --------------------------------------------------------------------- config

@dataclass(frozen=True)
class NAQSConfig:
    """Static model configuration (hashable; safe as a jit static arg)."""

    n_qubits: int
    sectors: Tuple[Tuple[int, int], ...]
    masking: Literal["none", "partial", "full"] = "partial"
    amp_hidden: Tuple[int, ...] = (64,)
    phase_hidden: Tuple[int, ...] = (512, 512)
    use_amp_spin_sym: bool = True
    use_phase_spin_sym: bool = False
    aggregate_phase: bool = False  # False -> one global phase net (production)
    num_lut: int = 0               # leading shells use lookup-table conditionals
    combined_amp_phase: bool = False  # one trunk emits amp+phase outputs
    phase_activation: Optional[str] = None  # none|softsign|tanh|hardtanh|sin|sigmoid
    input_encoding: Literal["binary", "integer"] = "binary"
    shell_order: Tuple[int, ...] = ()  # model shell j <- state shell order[j]
    param_dtype: str = "float32"

    def __post_init__(self):
        if self.n_qubits % 2:
            raise ValueError("n_qubits must be even (orbital shells)")
        if not self.shell_order:
            # reference default: reversed qubit ordering (wavefunction.py:372-378)
            object.__setattr__(
                self, "shell_order", tuple(range(self.n_shells - 1, -1, -1))
            )
        if sorted(self.shell_order) != list(range(self.n_shells)):
            raise ValueError("shell_order must be a permutation of shells")
        if not (0 <= self.num_lut <= min(self.n_shells, 8)):
            raise ValueError("num_lut must be in [0, min(n_shells, 8)]")
        if self.num_lut >= self.n_shells and not self.aggregate_phase:
            raise ValueError("num_lut == n_shells with a single phase net is unsupported")
        if self.combined_amp_phase and self.use_amp_spin_sym != self.use_phase_spin_sym:
            # reference forces identical spin-sym settings for combined
            # blocks (nade.py:257-262)
            object.__setattr__(self, "use_phase_spin_sym", self.use_amp_spin_sym)

    @property
    def n_shells(self) -> int:
        return self.n_qubits // 2

    @property
    def in_width(self) -> int:
        # binary: 2(S-1) signed bits; integer: one value per previous shell
        # (reference InputEncoding, nade.py:285-291,519-538)
        if self.input_encoding == "integer":
            return max(self.n_shells - 1, 1)
        return 2 * max(self.n_shells - 1, 1)

    @property
    def n_amp_out(self) -> int:
        return 5 if self.use_amp_spin_sym else 4

    @property
    def n_phase_out(self) -> int:
        return 3 if self.use_phase_spin_sym else 4

    @property
    def dtype(self):
        return jnp.dtype(self.param_dtype)


# --------------------------------------------------------------------- params

def _init_mlp_stack(key, n_stack, dims, dtype):
    """Per-shell-stacked dense layers: W (n_stack, d_in, d_out), b (n_stack, d_out)."""
    layers = []
    for d_in, d_out in zip(dims[:-1], dims[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        bound = 1.0 / math.sqrt(max(d_in, 1))
        w = jax.random.uniform(k1, (n_stack, d_in, d_out), dtype, -bound, bound)
        b = jax.random.uniform(k2, (n_stack, d_out), dtype, -bound, bound)
        layers.append({"w": w, "b": b})
    return layers


def _amp_out_dim(cfg: NAQSConfig) -> int:
    return cfg.n_amp_out + (cfg.n_phase_out if cfg.combined_amp_phase else 0)


def init_params(key, cfg: NAQSConfig) -> dict:
    s = cfg.n_shells
    k_amp, k_ph, k_lut = jax.random.split(key, 3)
    n_amp_out = _amp_out_dim(cfg)
    amp_dims = (cfg.in_width, *cfg.amp_hidden, n_amp_out)
    params = {"amp": _init_mlp_stack(k_amp, s, amp_dims, cfg.dtype)}
    if not cfg.combined_amp_phase:
        ph_dims = (cfg.in_width, *cfg.phase_hidden, cfg.n_phase_out)
        n_phase_nets = s if cfg.aggregate_phase else 1
        params["phase"] = _init_mlp_stack(k_ph, n_phase_nets, ph_dims, cfg.dtype)
    if cfg.num_lut:
        # explicit lookup-table conditionals for the first num_lut model
        # shells (reference OrbitalLUT, nade.py:117-155); one learnable row
        # per canonicalized input pattern
        base_amp = _lut_base(cfg, cfg.use_amp_spin_sym)
        keys = jax.random.split(k_lut, cfg.num_lut)
        params["lut"] = [
            jax.random.normal(keys[j], (base_amp**j, n_amp_out), cfg.dtype)
            for j in range(cfg.num_lut)
        ]
        if cfg.aggregate_phase and not cfg.combined_amp_phase:
            base_ph = _lut_base(cfg, cfg.use_phase_spin_sym)
            keys2 = jax.random.split(jax.random.fold_in(k_lut, 1), cfg.num_lut)
            params["lut_phase"] = [
                jax.random.normal(keys2[j], (base_ph**j, cfg.n_phase_out), cfg.dtype)
                for j in range(cfg.num_lut)
            ]
    return params


def count_parameters(params) -> int:
    return int(sum(x.size for x in jax.tree_util.tree_leaves(params)))


# full-f32 matmuls: the nets are tiny, and default bf16 MXU passes put a
# ~1e-3 floor under log-amplitude resolution (the energies resolve 1e-6)
_PRECISION = jax.lax.Precision.HIGHEST


def _mlp_stack_apply(layers, x, eps=None, taps=None):
    """x: (..., n_stack, d_in) -> (..., n_stack, d_out); ReLU between layers.

    `eps`: optional per-layer zero perturbations added to each pre-activation
    (grad w.r.t. eps[li] = per-example pre-activation gradient); `taps`: a
    list collecting each layer's input. Both serve KFAC factor estimation
    (naqs_tpu/kfac.py; reference KFACOptimizer, src/optimizer/utils.py:19-268).
    """
    n = len(layers)
    for li, lyr in enumerate(layers):
        if taps is not None:
            taps.append(x)
        x = jnp.einsum("...si,sio->...so", x, lyr["w"], precision=_PRECISION) + lyr["b"]
        if eps is not None:
            x = x + eps[li]
        if li < n - 1:
            x = jax.nn.relu(x)
    return x


def _mlp_single_apply(layers, idx, x, eps=None, taps=None):
    """Apply one shell's slice of a stacked MLP. x: (..., d_in)."""
    n = len(layers)
    for li, lyr in enumerate(layers):
        if taps is not None:
            taps.append(x)
        w = lyr["w"][idx] if lyr["w"].shape[0] > 1 else lyr["w"][0]
        b = lyr["b"][idx] if lyr["b"].shape[0] > 1 else lyr["b"][0]
        x = jnp.dot(x, w, precision=_PRECISION) + b
        if eps is not None:
            x = x + eps[li]
        if li < n - 1:
            x = jax.nn.relu(x)
    return x


# ------------------------------------------------------------------- features

def split_spins(cfg: NAQSConfig, states: jnp.ndarray):
    """Packed states -> (alpha, beta) occupation bits (B, S) in MODEL order."""
    bits = unpack_bits(states, cfg.n_qubits)  # (B, N)
    order = jnp.asarray(cfg.shell_order, dtype=jnp.int32)
    alpha = bits[..., 0::2][..., order]
    beta = bits[..., 1::2][..., order]
    return alpha, beta


def prefix_stats(alpha: jnp.ndarray, beta: jnp.ndarray):
    """Per-shell prefix statistics (exclusive over shells < j).

    Returns dict with counts (ca, cb), prefix integers (pa, pb) with shell t
    weighted 2^t, and the 3-way exchange order flag per shell
    (0: pa > pb -> substrings swapped, 1: equal, 2: pa < pb).
    """
    s = alpha.shape[-1]
    excl = lambda x: jnp.cumsum(x, axis=-1) - x  # exclusive cumsum
    ca, cb = excl(alpha), excl(beta)
    w = (jnp.int64(1) << jnp.arange(s, dtype=jnp.int64))
    pa = excl(alpha.astype(jnp.int64) * w)
    pb = excl(beta.astype(jnp.int64) * w)
    order3 = jnp.where(pa > pb, 0, jnp.where(pa == pb, 1, 2)).astype(jnp.int32)
    return {"ca": ca, "cb": cb, "pa": pa, "pb": pb, "order3": order3}


def _signed(bits):
    return (2 * bits - 1).astype(jnp.float32)


def shell_inputs(cfg: NAQSConfig, alpha, beta, canonical: bool):
    """(B, S, in_width) padded inputs for every shell.

    binary encoding: signed +-1 bits, layout [first substring (S-1 slots),
    second substring]; with `canonical`, the lexicographically-smaller spin
    substring goes first (spin-exchange-invariant input, nade.py:519-530).
    integer encoding: one value per previous shell — exchange-invariant
    occupation sum a+b-1 when canonical, else 2a+b (nade.py:521-536).
    """
    s = cfg.n_shells
    causal = (
        jnp.arange(s - 1)[None, :] < jnp.arange(s)[:, None]
    )  # (S, S-1): slot t live for shell j iff t < j
    if cfg.input_encoding == "integer":
        if canonical:
            v = (alpha + beta - 1).astype(jnp.float32)
        else:
            v = (2 * alpha + beta).astype(jnp.float32)
        return v[..., None, : s - 1] * causal  # (B, S, S-1)
    a_in = _signed(alpha)[..., None, : s - 1] * causal  # (B, S, S-1)
    b_in = _signed(beta)[..., None, : s - 1] * causal
    if canonical:
        st = prefix_stats(alpha, beta)
        swap = (st["order3"] == 0)[..., None]  # (B, S, 1)
        first = jnp.where(swap, b_in, a_in)
        second = jnp.where(swap, a_in, b_in)
    else:
        first, second = a_in, b_in
    return jnp.concatenate([first, second], axis=-1)


# A5[order3] maps the 5 raw amp logits onto 4 occupations [00, a, b, ab]
# (occ index = alpha + 2*beta). Logits: [l00, l_sym01, l11, d1, d2];
# symmetrized output = (base + gathered)/2 per reference nade.py:576-594.
_SYM_BASE = np.array([0, 1, 1, 2])
_SYM_GATHER = np.array([[0, 3, 4, 2], [0, 1, 1, 2], [0, 4, 3, 2]])


def symmetrize_amp(logits5: jnp.ndarray, order3: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) + order flag -> (..., 4) exchange-symmetric amp logits."""
    base = logits5[..., _SYM_BASE]
    gath = jnp.take_along_axis(
        logits5, jnp.asarray(_SYM_GATHER)[order3], axis=-1
    )
    return 0.5 * (base + gath)


def occupation_mask(cfg: NAQSConfig, ca, cb, j=None):
    """(..., 4) bool mask of occupations allowed by the electron-number
    budgets, OR'd over sectors (reference nade.py:417-501).

    ca, cb: prefix up-counts; j: shell index (same shape), for down-budgets.
    """
    s = cfg.n_shells
    if j is None:
        j = jnp.arange(s, dtype=ca.dtype)
        j = jnp.broadcast_to(j, ca.shape)
    da, db = j - ca, j - cb  # prefix down-counts
    mask = jnp.zeros((*ca.shape, 4), dtype=bool)
    for (na, nb) in cfg.sectors:
        ok = (ca <= na) & (da <= s - na) & (cb <= nb) & (db <= s - nb)
        a1 = ca < na
        a0 = da < s - na
        b1 = cb < nb
        b0 = db < s - nb
        m = jnp.stack([a0 & b0, a1 & b0, a0 & b1, a1 & b1], axis=-1)
        mask = mask | (m & ok[..., None])
    return mask


def scaled_phase_activation(name: str, x: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Scaled phase activations (reference activations.py:81-149): map raw
    outputs into [-pi, pi]-ish ranges; where the amplitude mask leaves only
    one option (deterministic output), the phase is pinned to 0."""
    if name == "softsign":
        y = jnp.pi * x / (1.0 + jnp.abs(x))
    elif name == "tanh":
        y = jnp.pi * jnp.tanh(x)
    elif name == "hardtanh":
        y = jnp.pi * jnp.clip(x, -1.0, 1.0)
    elif name == "sin":
        y = jnp.pi * jnp.sin(x) ** 2
    elif name == "sigmoid":
        y = jnp.pi * jax.nn.sigmoid(x)
    else:
        raise ValueError(f"unknown phase activation '{name}'")
    if mask is not None and y.shape[-1] == mask.shape[-1]:
        deterministic = jnp.sum(mask, axis=-1, keepdims=True) == 1
        y = jnp.where(deterministic & mask, 0.0, y)
    return y


def masked_log_softmax_half(logits4: jnp.ndarray, mask) -> jnp.ndarray:
    """0.5 * log_softmax(2x) with -inf-style masking (SoftmaxLogProbAmps,
    reference activations.py:40-46). Returns masked log-amplitudes."""
    z = 2.0 * logits4
    if mask is not None:
        z = jnp.where(mask, z, BIG_NEG)
    out = 0.5 * jax.nn.log_softmax(z, axis=-1)
    if mask is not None:
        # an all-False row (prefix satisfiable by no sector) must emit -inf
        # amplitudes, not the uniform log(1/4) a fully-masked softmax yields
        # (reference marks mask.sum()==0 rows as already-invalid)
        out = jnp.where(jnp.any(mask, axis=-1, keepdims=True), out, 0.5 * BIG_NEG)
    return out


# ------------------------------------------------------------------- predict

def _lut_base(cfg: NAQSConfig, canonical: bool) -> int:
    """Digits per previous shell in a LUT row index."""
    if cfg.input_encoding == "integer":
        return 3 if canonical else 4
    return 4  # two binary bits per shell


def _lut_index(cfg: NAQSConfig, x: jnp.ndarray, j: int, canonical: bool = True) -> jnp.ndarray:
    """LUT row index for shell j from the padded input tensor row x
    (reference OrbitalLUT._state2idx, nade.py:142)."""
    s = cfg.n_shells
    if j == 0:
        return jnp.zeros(x.shape[:-1], dtype=jnp.int32)
    if cfg.input_encoding == "integer":
        base = _lut_base(cfg, canonical)
        digits = jnp.round(x[..., :j]).astype(jnp.int32) + (1 if canonical else 0)
        w = base ** jnp.arange(j, dtype=jnp.int32)
        return jnp.sum(digits * w, axis=-1)
    first = (x[..., :j] > 0).astype(jnp.int32)
    second = (x[..., s - 1:s - 1 + j] > 0).astype(jnp.int32)
    w = (1 << jnp.arange(j, dtype=jnp.int32))
    return jnp.sum(first * w, axis=-1) + jnp.sum(second * (w << j), axis=-1)


def _apply_luts(cfg, tables, x, raw, canonical=True):
    """Overwrite raw logits of shells < num_lut with LUT rows."""
    for j in range(cfg.num_lut):
        idx = _lut_index(cfg, x[..., j, :], j, canonical)
        raw = raw.at[..., j, :].set(tables[j][idx])
    return raw


def _tables(cfg: NAQSConfig, params, alpha, beta, st, eps=None, taps=None):
    """Per-shell conditional tables: (log_amp4, mask4, phase4), each
    (..., S, 4) in MODEL shell order.

    eps/taps: optional KFAC instrumentation dicts keyed "amp"/"phase"
    (see _mlp_stack_apply)."""
    s = cfg.n_shells
    eps = eps or {}
    x_amp = shell_inputs(cfg, alpha, beta, canonical=cfg.use_amp_spin_sym)
    raw = _mlp_stack_apply(params["amp"], x_amp, eps.get("amp"),
                           None if taps is None else taps.setdefault("amp", []))
    if cfg.num_lut:
        raw = _apply_luts(cfg, params["lut"], x_amp, raw, cfg.use_amp_spin_sym)

    if cfg.combined_amp_phase:
        raw_amp = raw[..., : cfg.n_amp_out]
        raw_phase = raw[..., cfg.n_amp_out:]
    else:
        raw_amp = raw
        x_ph = (
            x_amp
            if cfg.use_phase_spin_sym == cfg.use_amp_spin_sym
            else shell_inputs(cfg, alpha, beta, canonical=cfg.use_phase_spin_sym)
        )
        ph_taps = None if taps is None else taps.setdefault("phase", [])
        if cfg.aggregate_phase:
            raw_phase = _mlp_stack_apply(params["phase"], x_ph, eps.get("phase"),
                                         ph_taps)  # (B, S, 3|4)
            if cfg.num_lut:
                raw_phase = _apply_luts(
                    cfg, params["lut_phase"], x_ph, raw_phase, cfg.use_phase_spin_sym
                )
        else:
            # one global net evaluated on the final shell's input
            raw_last = _mlp_single_apply(params["phase"], 0, x_ph[..., s - 1, :],
                                         eps.get("phase"), ph_taps)
            raw_phase = jnp.zeros((*x_ph.shape[:-1], raw_last.shape[-1]), raw_last.dtype)
            raw_phase = raw_phase.at[..., s - 1, :].set(raw_last)

    # --- amplitude head
    if cfg.use_amp_spin_sym:
        logits4 = symmetrize_amp(raw_amp, st["order3"])
    else:
        logits4 = raw_amp
    if cfg.masking == "none":
        mask = None
        log_amp = masked_log_softmax_half(logits4, None)
    else:
        mask = occupation_mask(cfg, st["ca"], st["cb"])
        if cfg.masking == "partial":
            # last shell unmasked (reference nade.py:615-616)
            mask = mask.at[..., s - 1, :].set(True)
        log_amp = masked_log_softmax_half(logits4, mask)

    # --- phase head
    if cfg.phase_activation is not None:
        raw_phase = scaled_phase_activation(cfg.phase_activation, raw_phase, mask)
    if cfg.use_phase_spin_sym:
        phase4 = raw_phase[..., jnp.asarray([0, 1, 1, 2])]
        # exchange phase shift pi*(N01 mod 2) on the canonical-swapped partner
        # (reference nade.py:597-610), applied at the last shell.
        full_pa = st["pa"][..., s - 1] + alpha[..., s - 1].astype(jnp.int64) * (1 << (s - 1))
        full_pb = st["pb"][..., s - 1] + beta[..., s - 1].astype(jnp.int64) * (1 << (s - 1))
        n01 = jnp.sum((alpha == 0) & (beta == 1), axis=-1)
        shift = jnp.where(full_pa < full_pb, jnp.pi * (n01 % 2), 0.0)
        phase4 = phase4.at[..., s - 1, :].add(shift[..., None])
    else:
        phase4 = raw_phase
    return log_amp, mask, phase4


def shell_tables(cfg: NAQSConfig, params, states: jnp.ndarray):
    """Full conditional tables for packed states.

    Returns (log_amp, phase): each (B, S, 4) in MODEL shell order.
    Mirrors the reference predict output [batch, shell, occ, (amp, phase)]
    (nade.py:738-770).
    """
    alpha, beta = split_spins(cfg, states)
    st = prefix_stats(alpha, beta)
    log_amp, _, phase = _tables(cfg, params, alpha, beta, st)
    return log_amp, phase


def log_psi(cfg: NAQSConfig, params, states: jnp.ndarray):
    """log|psi| and arg(psi) for packed states: gather realized occupations
    and sum over shells (reference wavefunction.py:148-183)."""
    alpha, beta = split_spins(cfg, states)
    st = prefix_stats(alpha, beta)
    log_amp4, _, phase4 = _tables(cfg, params, alpha, beta, st)
    occ = (alpha + 2 * beta).astype(jnp.int32)[..., None]  # (B, S, 1)
    la = jnp.take_along_axis(log_amp4, occ, axis=-1)[..., 0]
    ph = jnp.take_along_axis(phase4, occ, axis=-1)[..., 0]
    return jnp.sum(la, axis=-1), jnp.sum(ph, axis=-1)


def make_zero_eps(cfg: NAQSConfig, params, batch_size: int) -> dict:
    """Zero pre-activation perturbations matching log_psi_taps's forward.

    Differentiating w.r.t. these yields per-example pre-activation gradients
    (the `g` of KFAC's G = E[g g^T]; naqs_tpu/kfac.py)."""
    eps = {}
    for name in ("amp", "phase"):
        if name not in params:
            continue
        layers = []
        for lyr in params[name]:
            n_stack, d_out = lyr["b"].shape
            if name == "phase" and not cfg.aggregate_phase:
                layers.append(jnp.zeros((batch_size, d_out), lyr["b"].dtype))
            else:
                layers.append(jnp.zeros((batch_size, n_stack, d_out), lyr["b"].dtype))
        eps[name] = layers
    return eps


def log_psi_taps(cfg: NAQSConfig, params, states: jnp.ndarray, eps: dict):
    """log_psi with KFAC instrumentation: adds `eps` (zeros) to every dense
    pre-activation and returns each layer's input.

    Returns ((log_amp, phase), taps) where taps[name][li] is the input to
    dense layer li of stack `name`."""
    alpha, beta = split_spins(cfg, states)
    st = prefix_stats(alpha, beta)
    taps: dict = {}
    log_amp4, _, phase4 = _tables(cfg, params, alpha, beta, st, eps=eps, taps=taps)
    occ = (alpha + 2 * beta).astype(jnp.int32)[..., None]
    la = jnp.take_along_axis(log_amp4, occ, axis=-1)[..., 0]
    ph = jnp.take_along_axis(phase4, occ, axis=-1)[..., 0]
    return (jnp.sum(la, axis=-1), jnp.sum(ph, axis=-1)), taps


# ------------------------------------------------ sampler-facing single shell

def amp_conditional_shell(cfg: NAQSConfig, params, j, alpha, beta):
    """Masked amp table for ONE shell index j (traced) over a frontier.

    alpha, beta: (U, S) prefix occupation bits (entries at shells >= j must
    be 0). Returns (log_amp4, mask4, probs4): (U, 4) each.
    """
    s = cfg.n_shells
    causal = jnp.arange(s - 1) < j  # (S-1,)
    a_in = _signed(alpha)[..., : s - 1] * causal
    b_in = _signed(beta)[..., : s - 1] * causal
    w = (jnp.int64(1) << jnp.arange(s, dtype=jnp.int64)) * (jnp.arange(s) < j)
    pa = jnp.sum(alpha.astype(jnp.int64) * w, axis=-1)
    pb = jnp.sum(beta.astype(jnp.int64) * w, axis=-1)
    order3 = jnp.where(pa > pb, 0, jnp.where(pa == pb, 1, 2)).astype(jnp.int32)

    if cfg.input_encoding == "integer":
        if cfg.use_amp_spin_sym:
            v = (alpha + beta - 1).astype(jnp.float32)
        else:
            v = (2 * alpha + beta).astype(jnp.float32)
        x = v[..., : s - 1] * causal
    elif cfg.use_amp_spin_sym:
        swap = (order3 == 0)[..., None]
        x = jnp.concatenate(
            [jnp.where(swap, b_in, a_in), jnp.where(swap, a_in, b_in)], axis=-1
        )
    else:
        x = jnp.concatenate([a_in, b_in], axis=-1)
    raw = _mlp_single_apply(params["amp"], j, x)
    if cfg.num_lut:
        # LUT shells dispatch by traced shell index via lax.switch
        out_dim = raw.shape[-1]

        def mk_branch(jj):
            def branch(x):
                idx = _lut_index(cfg, x, jj, cfg.use_amp_spin_sym)
                return params["lut"][jj][idx].astype(raw.dtype)
            return branch

        branches = [mk_branch(jj) for jj in range(cfg.num_lut)]
        branches.append(lambda x: jnp.zeros((*x.shape[:-1], out_dim), raw.dtype))
        lut_raw = jax.lax.switch(jnp.minimum(j, cfg.num_lut), branches, x)
        raw = jnp.where(j < cfg.num_lut, lut_raw, raw)
    if cfg.combined_amp_phase:
        raw = raw[..., : cfg.n_amp_out]
    logits4 = symmetrize_amp(raw, order3) if cfg.use_amp_spin_sym else raw

    ca = jnp.sum(alpha * (jnp.arange(s) < j), axis=-1)
    cb = jnp.sum(beta * (jnp.arange(s) < j), axis=-1)
    mask = occupation_mask(cfg, ca, cb, j=jnp.broadcast_to(j, ca.shape))

    if cfg.masking == "none":
        log_amp = masked_log_softmax_half(logits4, None)
    elif cfg.masking == "partial":
        # mask except at the last shell — j is traced, so select at runtime
        m = jnp.where(j == s - 1, jnp.ones_like(mask), mask)
        log_amp = masked_log_softmax_half(logits4, m)
    else:
        log_amp = masked_log_softmax_half(logits4, mask)

    probs = jnp.exp(2.0 * log_amp)
    return log_amp, mask, probs
