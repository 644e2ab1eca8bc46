"""Fused coordinate-transform + spatial-decoder Pallas kernel.

This fuses the reference's hot loops #2 and #3 (SURVEY.md section 3.2): the
per-sample affine grid transform (``pyroved/utils/coord.py:47-88``) and the
per-pixel coordinate MLP (``pyroved/nets/fc.py:155-237``) into ONE TPU
kernel. The XLA path materializes the warped grid [B, N, 2] and every
hidden activation [B, N, H] in HBM between matmuls; here each (batch-tile,
pixel-tile) block stays resident in VMEM through the whole chain:

  coords' = (grid @ R(phi)) * sc + dx        (folded into per-batch vectors)
  h0 = tanh(gx * u_b + gy * v_b + w_b)        u,v,w in R^H per batch item
  h_{l+1} = tanh(h_l @ W_l + b_l)             MXU matmuls, VMEM-resident
  out = sigmoid(h_L @ w_out + b_out)

The rotation/scale/translation never touch HBM at all: they are folded into
per-batch H-vectors (u = sc*(cos*Wc0 + sin*Wc1), v = sc*(-sin*Wc0 + cos*Wc1),
w = dx@Wc + bc + z@Wz), turning the 2x2 bmm of the reference into two
VPU outer products.

A custom VJP routes the backward pass through a second fused kernel that
recomputes activations tile-by-tile (flash-attention-style rematerialization)
and accumulates weight gradients across grid steps in VMEM.

Transform-gradient derivation (for the folded form): with
a0 = cos*Wc0 + sin*Wc1, a1 = -sin*Wc0 + cos*Wc1, u = sc*a0, v = sc*a1 and
h0_pre[b,n] = gx[n]*u_b + gy[n]*v_b + w_b, let d0 = dL/d(h0_pre). Then

  du_b = sum_n gx[n] d0[b,n,:],   dv_b = sum_n gy[n] d0[b,n,:],
  dw_b = sum_n d0[b,n,:]
  dsc_b  = <du_b, a0_b> + <dv_b, a1_b>            (u,v linear in sc)
  dphi_b = <du_b, v_b> - <dv_b, u_b>              (du/dphi = v, dv/dphi = -u)
  ddx_b  = dw_b @ Wc^T,  dz_b = dw_b @ Wz^T
  dWc0   = (sc*cos)^T du - (sc*sin)^T dv + dx0^T dw
  dWc1   = (sc*sin)^T du + (sc*cos)^T dv + dx1^T dw

All verified against jax.grad of the unfolded reference to 1e-4
(tests/test_ops_fused.py).
"""
import dataclasses
import functools
import warnings
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Tile selection. The kernel's cost tracks PADDED elements
# (round_up(B, B_T) * round_up(N, n_t)), so the tile is chosen per call to
# minimize padded work within the VMEM budget for the backward's
# rematerialized activation stack. Measured at the flagship shape
# (B=200, N=784, H=128, 2 layers): the round-1 fixed (8,512) tile ran the
# backward in 636 us; the selected (40,128) tile — zero batch padding,
# 14% pixel padding instead of 31% — runs it in 450 us (1.41x). Large
# pad-free shapes (e.g. B=32, N=65536) keep their exact tilings.
# Set B_T / N_T to integers to override the automatic choice (experiments).
B_T = None
N_T = None

# Per-tile activation working set the backward may use: (n_layers + 1)
# rematerialized hs + d_pre + dh + dl_bn buffers of [rows, Hp] f32 — plus
# n_layers captured act'(pre) buffers for pre-grad activations (gelu); see
# _select_tiles for the authoritative accounting.
# Calibrated on v5e: rows=5120 at H=128/nl=2 (15.7 MB) compiles, rows>=6144
# does not.
_VMEM_BUDGET = 16 * 1024 * 1024


# ---------------------------------------------------------------------------
# Per-platform tuning. Every threshold in this module was MEASURED on one
# chip generation (TPU v5e); on a different generation the routing could
# silently pick the slower path or the kernel could fail to compile (VMEM
# differs). Resolution order for each knob, at every call:
#   1. an explicit module-global override (monkeypatch / experiments /
#      the multichip dryrun's FUSED_MIN_BNH=0 pin) — any value different
#      from the import-time default wins;
#   2. the DEVICE_TUNINGS entry for jax.devices()[0].device_kind;
#   3. unknown TPU generations: the CONSERVATIVE entry (always-XLA routing,
#      halved VMEM budget for direct kernel calls) — and the model-level
#      fusion gate stays CLOSED until `calibrate()` measures the platform
#      and registers a tuning.
# Non-TPU platforms keep the v5e defaults: they only ever execute the
# kernel in interpret mode, where the thresholds are test-controlled.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class KernelTuning:
    """Measured routing thresholds for one TPU generation."""
    vmem_budget: int          # backward remat working set per tile (bytes)
    xla_fwd_max_bn: float     # route forward to XLA below this many B*N
    pallas_fwd_max_pad: float  # ... or above this tile-padding ratio
    fused_min_bnh: float      # route the whole train path to XLA below this
    tile_overhead_rows: int = 512  # cost model: padded*(rows+OVH)/rows


_V5E_TUNING = KernelTuning(
    vmem_budget=16 * 1024 * 1024,
    xla_fwd_max_bn=1 << 19,
    pallas_fwd_max_pad=1.1,
    fused_min_bnh=13_500_000,
)

#: Tunings by ``jax.devices()[0].device_kind``. v5e values are measured
#: (docs/PERFORMANCE.md); register your own entry (or run
#: :func:`calibrate`) to enable the fused kernel on other generations.
DEVICE_TUNINGS: Dict[str, KernelTuning] = {
    "TPU v5 lite": _V5E_TUNING,   # v5e reports this device_kind
    "TPU v5e": _V5E_TUNING,
}

# Unknown TPU generation: direct kernel calls get a halved VMEM budget and
# never self-select over XLA; models route pure-XLA (gate closed).
_CONSERVATIVE_TUNING = KernelTuning(
    vmem_budget=8 * 1024 * 1024,
    xla_fwd_max_bn=float("inf"),
    pallas_fwd_max_pad=1.0,
    fused_min_bnh=float("inf"),
)

# Import-time values of the four routing globals, the reference point for
# override detection in _tuning(). Populated ONCE right after the last of
# them is defined below (single source of truth — no duplicated literals).
# Caveat (documented): a knob explicitly SET to a value equal to its
# default is indistinguishable from "unset" and resolves per-platform; to
# force specific values on an unknown platform, register an entry in
# DEVICE_TUNINGS instead of assigning module globals.
_DEFAULTS = {}
_warned_unknown = False


def _device_kind():
    return getattr(jax.devices()[0], "device_kind", None)


def _tuning() -> KernelTuning:
    """The active tuning (see resolution order in the section comment)."""
    global _warned_unknown
    dev = jax.devices()[0]
    base = DEVICE_TUNINGS.get(_device_kind())
    if base is None:
        if dev.platform == "tpu":
            base = _CONSERVATIVE_TUNING
            if not _warned_unknown:
                _warned_unknown = True
                warnings.warn(
                    f"no kernel tuning for TPU device kind "
                    f"{_device_kind()!r}: the spatial decoder routes to XLA "
                    f"(always correct, possibly slower). Run "
                    f"pyroved_tpu.ops.spatial_decoder.calibrate() once to "
                    f"measure this platform and enable the fused kernel.",
                    stacklevel=3)
        else:
            base = _V5E_TUNING  # CPU/interpret: thresholds are test-driven

    def pick(gname, field):
        g = globals()[gname]
        return g if g != _DEFAULTS[gname] else getattr(base, field)

    return KernelTuning(
        vmem_budget=pick("_VMEM_BUDGET", "vmem_budget"),
        xla_fwd_max_bn=pick("XLA_FWD_MAX_BN", "xla_fwd_max_bn"),
        pallas_fwd_max_pad=pick("PALLAS_FWD_MAX_PAD", "pallas_fwd_max_pad"),
        fused_min_bnh=pick("FUSED_MIN_BNH", "fused_min_bnh"),
        tile_overhead_rows=base.tile_overhead_rows,
    )


def _select_tiles(B: int, N: int, H: int, n_layers: int,
                  act: str = "tanh") -> Tuple[int, int]:
    """Choose (B_T, n_t): B_T a multiple of 8 (f32 sublane), n_t a multiple
    of 128 (lanes), minimizing modeled cost within the VMEM row budget.

    Cost model fitted to the v5e backward sweep at B=200/N=784/H=128/nl=2
    (us per 1k padded elements: 3.54 @ 1024 rows, 3.16 @ 2048, 2.87 @ 3072,
    2.51 @ 5120): ``padded_elements * (rows + 512) / rows`` — padding is
    wasted MACs, small tiles pay per-tile overhead. Ties prefer more rows,
    then wider pixel tiles (longer contiguous DMAs). Pre-grad activations
    (gelu) charge one extra [rows, Hp] buffer per layer for the captured
    act'(pre) stack.

    The kernel's FIXED VMEM footprint — resident weight stacks, their
    gradient accumulators (2 x nl x Hp^2 f32 dominates), and Mosaic block
    I/O / stack slack — is charged against the budget before dividing by
    the per-row cost. Without it, a selection whose [rows, Hp] buffers
    alone exactly fill the budget OOMs the 16 MB scoped-vmem limit on real
    hardware (observed on v5e: gelu one-pass at the flagship shape picked
    4096 rows = 16.00 MB modeled and compiled to 16.53 MB actual)."""
    if (B_T is None) != (N_T is None):
        raise ValueError("set BOTH B_T and N_T to override tile selection "
                         "(or neither for the automatic choice)")
    if B_T is not None:
        return B_T, max(128, (N_T * 128) // int(H))
    t = _tuning()
    Hp = _round_up(int(H), 128)
    n_bufs = int(n_layers) + 4
    if act in _PRE_GRAD_ACTS:
        n_bufs += int(n_layers)
    fixed = 4 * (2 * int(n_layers) * Hp * Hp + 16 * Hp) + 256 * 1024
    rows_max = max(1024, (t.vmem_budget - fixed) // (n_bufs * Hp * 4))
    ovh = t.tile_overhead_rows
    cands = []
    for n_t in range(128, 1025, 128):
        for bt in range(8, 65, 8):
            rows = bt * n_t
            if rows > rows_max:
                break
            padded = _round_up(B, bt) * _round_up(N, n_t)
            cands.append((padded * (rows + ovh) / rows, rows, n_t, bt))
    best_cost = min(c[0] for c in cands)
    # Among candidates within 10% modeled cost, the measured tile-shape
    # effects dominate the padding difference: larger tiles win (B=256:
    # (40,128) with 9% batch pad runs 629 us vs 682 for the exact-fit
    # (32,128)), and at equal rows a taller batch tile wins ((32,128)
    # 597 us vs (8,512) 636 at B=200).
    cost, rows, n_t, bt = max((c for c in cands if c[0] <= 1.10 * best_cost),
                              key=lambda c: (c[1], c[3]))
    return bt, n_t

# Hidden-layer matmuls run bf16 x bf16 -> f32-accumulate on the MXU — the
# same effective precision XLA uses for f32 dots at default precision, at
# 1/3 the MXU passes of full-f32. Flip to False for bit-level f32 parity
# with Precision.HIGHEST reference paths.
BF16_MATMUL = True

# Hidden-activation dtype. Measured on v5e: bfloat16 activations give NO
# speedup over f32 here (Mosaic evaluates the tanh transcendental at full
# precision either way, and the casts add VPU work), so the default stays
# f32 for strict parity. The flag remains for memory-constrained configs
# (halves the activation VMEM, letting wider hidden dims keep larger tiles).
ACT_DTYPE = jnp.float32


# Run every pallas_call in interpret mode (pure-XLA simulation of the kernel
# grid). Lets the EXACT fused code path execute on CPU — used by the
# multichip dryrun and mesh tests to validate kernel-under-mesh semantics
# without TPU hardware.
INTERPRET = False


def _pallas(*args, **kwargs):
    if INTERPRET:
        kwargs["interpret"] = True
    return pl.pallas_call(*args, **kwargs)


def _mxu_dot(a, b):
    if BF16_MATMUL:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mxu_dot_at(a, b):
    """``a^T @ b`` contracting the sublane (row) axis of both operands
    directly on the MXU — no materialized transpose (Mosaic cannot
    lane<->sublane move inside the kernel)."""
    if BF16_MATMUL:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# NOTE on the backward's transposed matmuls (hs.T @ d_pre, d_pre @ hw.T):
# a transpose-free dot_general formulation (contracting sublane/lane axes
# directly, MXU A^T B / A B^T forms) measured -4% on the isolated ablation
# harness (benchmarks/bwd_ablation.py, full_dg) but REGRESSED the flagship
# end-to-end by ~7% (1380 -> 1288 steps/s) — Mosaic schedules the explicit
# .T better inside the full epoch-scan pipeline. Dropped; keep the .T form.


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pade_tanh(x):
    """7/6 Pade approximant of tanh with input clamp: max abs error < 2e-4
    vs exact tanh over all of R (< 1e-6 on |x| <= 3). Runs on the VPU as 7
    mul + 1 div instead of the microcoded transcendental — the opt-in
    ``approx_tanh`` speed lever for the tanh-throughput-bound step."""
    x = jnp.clip(x, -4.97, 4.97)
    x2 = x * x
    num = x * (135135.0 + x2 * (17325.0 + x2 * (378.0 + x2)))
    den = 135135.0 + x2 * (62370.0 + x2 * (3150.0 + 28.0 * x2))
    return num / den


# Hidden-layer activations supported by the kernel. The coord fusion layer
# (h0) follows the tanh flavor (exact or Pade), matching the reference's
# hardcoded coord_latent activation (nets/fc.py:219); only the MLP layers
# follow `activation`. For tanh/relu/lrelu/softplus the derivative is
# computable from the POST-activation value, which is what the
# rematerializing backward keeps: tanh' = 1-h^2; relu/lrelu preserve sign so
# the slope is selectable from h; softplus' = sigmoid(pre) = 1-exp(-h)
# (h = softplus(pre) >= 0 is stable). gelu is NOT invertible, so for it the
# backward's recompute loop captures act'(pre) while the pre-activation is
# live (one extra [rows, H] buffer per layer, charged by _select_tiles).
# (For 'tanh_approx' the exact-(1-h^2) form applied to the Pade output is
# itself an approximation, accurate to the same 2e-4.)

_SQRT_HALF = 0.7071067811865476     # 1/sqrt(2)
_INV_SQRT_2PI = 0.3989422804014327  # 1/sqrt(2*pi)


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 erf (max abs error 1.5e-7 — below f32
    output ulp). Mosaic has no erf lowering rule (only erf_inv), so the
    kernel-side gelu evaluates this exp+rational form on the VPU instead of
    ``jax.lax.erf``. Evaluated in f32 regardless of input dtype: the
    alternating-sign polynomial and the ``1 - poly*exp`` cancellation would
    lose ~1e-2 in bf16 (ACT_DTYPE lever), and the tile budget already
    charges 4 bytes/element."""
    dt = x.dtype
    x = x.astype(jnp.float32)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return (jnp.sign(x) * y).astype(dt)


def _act(name, x, in_kernel=False):
    if name == "tanh":
        return jnp.tanh(x)
    if name == "tanh_approx":
        return _pade_tanh(x)
    if name == "lrelu":  # torch nn.LeakyReLU default slope (utils/nn.py)
        return jnp.where(x >= 0.0, x, 0.01 * x)
    if name == "softplus":
        return jax.nn.softplus(x)
    if name == "gelu":
        if in_kernel:
            # inside Pallas the polynomial stands in for the missing erf
            # rule. The whole combine runs in f32 — the `1 + erf` term
            # cancels catastrophically in bf16 on the negative tail
            # (~200x the output-quantization error) — with ONE cast back.
            xf = x.astype(jnp.float32)
            h = 0.5 * xf * (1.0 + _erf_poly(xf * _SQRT_HALF))
            return h.astype(x.dtype)
        # exact (erf) flavor — the registry's own function, so XLA-context
        # callers (e.g. the shared-coords enumerated decode) match the
        # module apply bitwise
        return jax.nn.gelu(x, approximate=False)
    return jnp.maximum(x, 0.0)


def _h0_act(name, x):
    """Coord-fusion layer activation: tanh, in the requested flavor."""
    return _pade_tanh(x) if name == "tanh_approx" else jnp.tanh(x)


def _act_grad_from_post(name, h):
    if name in ("tanh", "tanh_approx"):
        return 1.0 - h * h
    if name == "lrelu":
        # h >= 0 <=> pre >= 0, matching jax.nn.leaky_relu's subgradient at 0
        return jnp.where(h >= 0.0, jnp.asarray(1.0, h.dtype),
                         jnp.asarray(0.01, h.dtype))
    if name == "softplus":
        return 1.0 - jnp.exp(-h)
    return (h > 0.0).astype(h.dtype)


# Activations whose derivative needs the PRE-activation (captured by the
# backward's recompute loop at an extra [rows, H] buffer per layer).
_PRE_GRAD_ACTS = ("gelu",)

# The kernel's hidden-activation menu: the reference's full registry
# (utils/nn.py:121-123) plus the opt-in Pade tanh. Single source of truth
# for every fusion gate (sdecoder_supports_fusion and the model-level
# fast-path gates import it) — do NOT duplicate this tuple.
KERNEL_ACTS = ("tanh", "relu", "lrelu", "softplus", "gelu")
KERNEL_ACTS_WITH_APPROX = KERNEL_ACTS + ("tanh_approx",)


def _act_and_grad_from_pre(name, x):
    """(act(x), act'(x)) sharing the expensive subexpression — the
    backward's recompute loop calls this so gelu's erf polynomial is
    evaluated ONCE per layer instead of twice (the backward is
    VPU-pass-bound; don't rely on downstream CSE). gelu'(x) =
    Phi(x) + x*phi(x). Everything runs in f32 (the `1 + erf` combine
    cancels catastrophically in bf16) with one cast back at the end."""
    assert name == "gelu", name
    xf = x.astype(jnp.float32)
    e = _erf_poly(xf * _SQRT_HALF)
    h = 0.5 * xf * (1.0 + e)
    cdf = 0.5 * (1.0 + e)
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * xf * xf)
    return h.astype(x.dtype), (cdf + xf * pdf).astype(x.dtype)


def _act_grad_from_pre(name, x):
    """d act / d pre, evaluated while the pre-activation is live (kernel
    context). Defined via :func:`_act_and_grad_from_pre` so the two can
    never diverge."""
    return _act_and_grad_from_pre(name, x)[1]


# ---------------------------------------------------------------------------
# Reference (pure-XLA) implementation — used for correctness tests and as
# the fallback for configurations the kernel does not support.
# ---------------------------------------------------------------------------

def spatial_decoder_reference(grid, phi, dx, sc, z, Wc, bc, Wz, hidden, wout, bout):
    """Pure-jnp spatial decode: grid [N,D], phi/sc [B] (or None), dx [B,D],
    z [B,L]; hidden = sequence of (W [H,H], b [H]). Returns [B, N].
    The act='tanh', sigmoid head special case of :func:`_xla_forward`."""
    hw = jnp.stack([W for W, _ in hidden])
    hb = jnp.stack([b for _, b in hidden])
    return _xla_forward(grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout, bout,
                        "tanh", True)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(n_layers, coord_dim, act, sigmoid_out, channels,
                grid_ref, phi_ref, dx_ref, sc_ref, z_ref,
                wc_ref, bc_ref, wz_ref, hw_ref, hb_ref, wout_ref, bout_ref,
                out_ref):
    gx = grid_ref[:, 0]  # [N_T]
    z = z_ref[:]         # [B_T, L]
    wc = wc_ref[:]       # [D, H]
    bc = bc_ref[:]       # [1, H]
    w_vec = dx_ref[:] @ wc + bc + z @ wz_ref[:]  # [B_T, H]
    if coord_dim == 2:
        gy = grid_ref[:, 1]
        c = jnp.cos(phi_ref[:])  # [B_T, 1]
        s = jnp.sin(phi_ref[:])
        sc = sc_ref[:]
        u = sc * (c * wc[0:1, :] + s * wc[1:2, :])    # [B_T, H]
        v = sc * (-s * wc[0:1, :] + c * wc[1:2, :])   # [B_T, H]
        pre = (gx[None, :, None] * u[:, None, :]
               + gy[None, :, None] * v[:, None, :]
               + w_vec[:, None, :])
    else:
        u = jnp.broadcast_to(wc[0:1, :], w_vec.shape)
        pre = gx[None, :, None] * u[:, None, :] + w_vec[:, None, :]
    h = _h0_act(act, pre.astype(ACT_DTYPE))  # h0 is tanh; VPU runs ACT_DTYPE
    bt, nt, H = h.shape
    h = h.reshape(bt * nt, H)
    for l in range(n_layers):
        h = _act(act, (_mxu_dot(h, hw_ref[l]) + hb_ref[l]).astype(ACT_DTYPE),
                 in_kernel=True)
    # output head as VPU lane-reduces, one per channel, static-unrolled
    # (wout passed transposed, [C, H]); a (BN, H) @ (H, C) matmul would
    # waste the MXU and trip Mosaic's lane<->sublane reshape restrictions
    hf = h.reshape(bt, nt, H).astype(jnp.float32)
    for ci in range(channels):
        logit = jnp.sum(hf * wout_ref[ci:ci + 1, :], axis=-1)  # [bt, nt] f32
        logit = logit + bout_ref[0, ci]
        val = jax.nn.sigmoid(logit) if sigmoid_out else logit
        if channels == 1:
            out_ref[:] = val
        else:
            out_ref[ci] = val


def _pad_rows(x: Array, rows: int) -> Array:
    pad = rows - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])


def _fwd(grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout, bout,
         act="tanh", sigmoid_out=True, tiles=None):
    """Padded pallas_call wrapper. grid [N,D], phi/sc [B], dx [B,D], z [B,L];
    hw [L_layers,H,H], hb [L_layers,H], wout [H,C], bout scalar or [C].
    Returns [B, N] for C == 1, else [B, N, C]."""
    B, N = z.shape[0], grid.shape[0]
    D = grid.shape[1]
    H = Wc.shape[1]
    C = wout.shape[1]
    n_layers = hw.shape[0]
    b_t, n_t = tiles or _select_tiles(B, N, H, n_layers)
    Bp, Np = _round_up(B, b_t), _round_up(N, n_t)

    grid_p = _pad_rows(grid, Np)
    z_p = _pad_rows(z, Bp)
    dx_p = _pad_rows(dx, Bp)
    phi_p = _pad_rows(phi[:, None], Bp)
    sc_p = _pad_rows(sc[:, None], Bp)
    bc2 = bc[None, :]
    bout2 = jnp.asarray(bout, jnp.float32).reshape(1, C)

    kernel = functools.partial(_fwd_kernel, int(n_layers), int(D), act,
                               bool(sigmoid_out), int(C))
    if C == 1:
        out_spec = pl.BlockSpec((b_t, n_t), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Bp, Np), jnp.float32)
    else:
        out_spec = pl.BlockSpec((C, b_t, n_t), lambda i, j: (0, i, j),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, Bp, Np), jnp.float32)
    out = _pallas(
        kernel,
        grid=(Bp // b_t, Np // n_t),
        in_specs=[
            pl.BlockSpec((n_t, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_t, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_t, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_t, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_t, z.shape[1]), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wz
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hidden Ws
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hidden bs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wout (transposed, [C, H])
            pl.BlockSpec((1, C), memory_space=pltpu.SMEM),  # bout
        ],
        out_specs=out_spec,
        out_shape=out_shape,
    )(grid_p, phi_p, dx_p, sc_p, z_p, Wc, bc2, Wz, hw, hb, wout.T, bout2)
    if C == 1:
        return out[:B, :N]
    return jnp.moveaxis(out, 0, -1)[:B, :N]


# ---------------------------------------------------------------------------
# Backward kernel: recompute activations per tile, accumulate grads.
# ---------------------------------------------------------------------------

def _bwd_kernel(n_layers, coord_dim, act, sigmoid_out, loss_mode, channels,
                *refs):
    if loss_mode:
        # fused train-gradient mode: forward + Bernoulli loss + backward in
        # ONE pass (no separate forward, no duplicate recompute). The recon
        # term enters the training loss linearly with per-example weights,
        # so its cotangent is known here and the gradients are exact.
        (grid_ref, phi_ref, dx_ref, sc_ref, z_ref,
         wc_ref, bc_ref, wz_ref, hw_ref, hb_ref, wout_ref, bout_ref,
         x_ref, wgt_ref, mask_ref,
         dphi_ref, ddx_ref, dsc_ref, dz_ref,
         dwc_ref, dbc_ref, dwz_ref, dhw_ref, dhb_ref, dwout_ref,
         dbout_ref, loss_ref) = refs
    else:
        (grid_ref, phi_ref, dx_ref, sc_ref, z_ref,
         wc_ref, bc_ref, wz_ref, hw_ref, hb_ref, wout_ref, bout_ref,
         g_ref,
         dphi_ref, ddx_ref, dsc_ref, dz_ref,
         dwc_ref, dbc_ref, dwz_ref, dhw_ref, dhb_ref, dwout_ref,
         dbout_ref) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)

    # zero batch-grad accumulators on the first pixel tile, weight-grad
    # accumulators on the very first grid step
    @pl.when(j == 0)
    def _():
        dphi_ref[:] = jnp.zeros_like(dphi_ref)
        ddx_ref[:] = jnp.zeros_like(ddx_ref)
        dsc_ref[:] = jnp.zeros_like(dsc_ref)
        dz_ref[:] = jnp.zeros_like(dz_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        dwc_ref[:] = jnp.zeros_like(dwc_ref)
        dbc_ref[:] = jnp.zeros_like(dbc_ref)
        dwz_ref[:] = jnp.zeros_like(dwz_ref)
        dhw_ref[:] = jnp.zeros_like(dhw_ref)
        dhb_ref[:] = jnp.zeros_like(dhb_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        for ci in range(channels):
            dbout_ref[0, ci] = 0.0
        if loss_mode:
            loss_ref[0, 0] = 0.0

    # ---- recompute forward ----
    gx = grid_ref[:, 0]
    z = z_ref[:]
    wc = wc_ref[:]
    bc = bc_ref[:]
    w_vec = dx_ref[:] @ wc + bc + z @ wz_ref[:]
    if coord_dim == 2:
        gy = grid_ref[:, 1]
        c = jnp.cos(phi_ref[:])
        s = jnp.sin(phi_ref[:])
        sc = sc_ref[:]
        a0 = c * wc[0:1, :] + s * wc[1:2, :]     # [B_T,H]
        a1 = -s * wc[0:1, :] + c * wc[1:2, :]
        u = sc * a0
        v = sc * a1
        pre0 = (gx[None, :, None] * u[:, None, :]
                + gy[None, :, None] * v[:, None, :]
                + w_vec[:, None, :])
    else:
        pre0 = gx[None, :, None] * wc[0:1, :][None] + w_vec[:, None, :]
    h0 = _h0_act(act, pre0.astype(ACT_DTYPE))
    bt, nt, H = h0.shape
    hs = [h0.reshape(bt * nt, H)]
    gs = []  # per-layer act'(pre), kept only for pre-grad activations (gelu)
    for l in range(n_layers):
        pre = (_mxu_dot(hs[-1], hw_ref[l]) + hb_ref[l]).astype(ACT_DTYPE)
        if act in _PRE_GRAD_ACTS:
            h, g = _act_and_grad_from_pre(act, pre)
            hs.append(h)
            gs.append(g)
        else:
            hs.append(_act(act, pre, in_kernel=True))
    hf = hs[-1].reshape(bt, nt, H).astype(jnp.float32)

    # ---- backprop. Mosaic restriction notes: no lane<->sublane reshapes,
    # no 3-D dots, and no axis-1 reductions of 3-D vectors — everything
    # below stays in 2-D [BN, H] space with full-sublane (axis-0) reduces,
    # using static per-batch row slices where a per-b reduction is needed.
    # Head gradients accumulate per channel (static unroll; C == 1 keeps
    # the original single-pass shapes).
    dh = None
    dl_cols = []
    for ci in range(channels):
        logit = jnp.sum(hf * wout_ref[ci:ci + 1, :], axis=-1)  # [bt,nt]
        logit = logit + bout_ref[0, ci]
        if loss_mode:
            # Bernoulli obs with the sigmoid head folded in:
            # log p(x|logit) = x*logit - softplus(logit) (stable form);
            # d(-w*logp)/dlogit = w * (sigmoid(logit) - x).
            x = x_ref[:]
            wm = wgt_ref[:] * mask_ref[:, 0][None, :]          # [bt, nt]
            logp = x * logit - jax.nn.softplus(logit)
            loss_ref[0, 0] += -jnp.sum(wm * logp)
            dl2 = wm * (jax.nn.sigmoid(logit) - x)
        elif sigmoid_out:
            out = jax.nn.sigmoid(logit)
            gci = g_ref[:] if channels == 1 else g_ref[ci]
            dl2 = gci * out * (1.0 - out)                      # [bt, nt]
        else:
            dl2 = g_ref[:] if channels == 1 else g_ref[ci]
        dbout_ref[0, ci] += jnp.sum(dl2)
        dl_bn = jnp.broadcast_to(dl2[..., None], (bt, nt, H)).reshape(bt * nt, H)
        dl_cols.append(dl_bn[:, 0:1])
        contrib = dl_bn * wout_ref[ci:ci + 1, :]
        dh = contrib if dh is None else dh + contrib
    # Head weight grad as ONE MXU contraction: every column of dl_bn is
    # dl2 flat, so hs[-1]^T @ [per-channel dl2 columns] is exactly dwout
    # [H, C] — replacing the two full [BN, H] VPU passes (mult + axis-0
    # reduce) per channel. Measured -41 us (6.9%) on the flagship
    # backward (benchmarks/bwd_ablation.py, mxu_dwout variant).
    dl_mat = dl_cols[0] if channels == 1 else jnp.concatenate(dl_cols, axis=1)
    dwout_ref[:] += _mxu_dot_at(hs[-1], dl_mat)
    for l in range(n_layers - 1, -1, -1):
        ag = gs[l] if act in _PRE_GRAD_ACTS else _act_grad_from_post(act, hs[l + 1])
        d_pre = dh * ag.astype(jnp.float32)
        dhw_ref[l] += _mxu_dot(hs[l].T, d_pre)
        dhb_ref[l] += jnp.sum(d_pre, axis=0)
        dh = _mxu_dot(d_pre, hw_ref[l].T)
    h0f = hs[0].astype(jnp.float32)
    d0 = dh * (1.0 - h0f * h0f)                            # [BN, H] f32

    # per-batch reductions over the pixel axis via static row slices
    gxc = grid_ref[:, 0:1]                                 # [nt, 1]
    dw_rows, du_rows, dv_rows = [], [], []
    for b in range(bt):
        sl = d0[b * nt:(b + 1) * nt, :]                    # [nt, H]
        dw_rows.append(jnp.sum(sl, axis=0, keepdims=True))
        du_rows.append(jnp.sum(gxc * sl, axis=0, keepdims=True))
        if coord_dim == 2:
            gyc = grid_ref[:, 1:2]
            dv_rows.append(jnp.sum(gyc * sl, axis=0, keepdims=True))
    dw_vec = jnp.concatenate(dw_rows, axis=0)              # [bt, H]
    du = jnp.concatenate(du_rows, axis=0)

    dz_ref[:] += jnp.dot(dw_vec, wz_ref[:].T, preferred_element_type=jnp.float32)
    dwz_ref[:] += jnp.dot(z.T, dw_vec, preferred_element_type=jnp.float32)
    dbc_ref[:] += jnp.sum(dw_vec, axis=0, keepdims=True)
    ddx_ref[:] += dw_vec @ wc.T

    if coord_dim == 2:
        dv = jnp.concatenate(dv_rows, axis=0)
        dsc_ref[:] += (jnp.sum(du * a0, -1, keepdims=True)
                       + jnp.sum(dv * a1, -1, keepdims=True))
        dphi_ref[:] += (jnp.sum(du * v, -1, keepdims=True)
                        - jnp.sum(dv * u, -1, keepdims=True))
        # dWc rows; include the dx-translation contribution via dw_vec
        dwc0 = (jnp.dot((sc * c).T, du, preferred_element_type=jnp.float32)
                - jnp.dot((sc * s).T, dv, preferred_element_type=jnp.float32)
                + jnp.dot(dx_ref[:][:, 0:1].T, dw_vec, preferred_element_type=jnp.float32))
        dwc1 = (jnp.dot((sc * s).T, du, preferred_element_type=jnp.float32)
                + jnp.dot((sc * c).T, dv, preferred_element_type=jnp.float32)
                + jnp.dot(dx_ref[:][:, 1:2].T, dw_vec, preferred_element_type=jnp.float32))
        dwc_ref[:] += jnp.concatenate([dwc0, dwc1], axis=0)
    else:
        dwc_ref[:] += (jnp.sum(du, axis=0, keepdims=True)
                       + jnp.dot(dx_ref[:].T, dw_vec, preferred_element_type=jnp.float32))


def _bwd(act, sigmoid_out, res, g):
    (grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout, bout) = res
    B, N = z.shape[0], grid.shape[0]
    D = grid.shape[1]
    H = Wc.shape[1]
    L = z.shape[1]
    C = wout.shape[1]
    n_layers = hw.shape[0]
    b_t, n_t = _select_tiles(B, N, H, n_layers, act)
    Bp, Np = _round_up(B, b_t), _round_up(N, n_t)

    grid_p = _pad_rows(grid, Np)
    z_p = _pad_rows(z, Bp)
    dx_p = _pad_rows(dx, Bp)
    phi_p = _pad_rows(phi[:, None], Bp)
    sc_p = _pad_rows(sc[:, None], Bp)
    if C == 1:
        g_p = jnp.zeros((Bp, Np), jnp.float32).at[:B, :N].set(g)
        g_spec = pl.BlockSpec((b_t, n_t), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
    else:  # cotangent arrives [B, N, C]; kernel wants channel-major blocks
        g_p = jnp.zeros((C, Bp, Np), jnp.float32).at[:, :B, :N].set(
            jnp.moveaxis(g, -1, 0))
        g_spec = pl.BlockSpec((C, b_t, n_t), lambda i, j: (0, i, j),
                              memory_space=pltpu.VMEM)
    bc2 = bc[None, :]
    bout2 = jnp.asarray(bout, jnp.float32).reshape(1, C)

    kernel = functools.partial(_bwd_kernel, int(n_layers), int(D), act,
                               bool(sigmoid_out), False, int(C))
    full = lambda i, j: (0, 0)
    full3 = lambda i, j: (0, 0, 0)
    batch_blk = lambda w: pl.BlockSpec((b_t, w), lambda i, j: (i, 0),
                                       memory_space=pltpu.VMEM)
    outs = _pallas(
        kernel,
        grid=(Bp // b_t, Np // n_t),
        in_specs=[
            pl.BlockSpec((n_t, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            batch_blk(1), batch_blk(D), batch_blk(1), batch_blk(L),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wz
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wout (transposed, [C, H])
            pl.BlockSpec((1, C), memory_space=pltpu.SMEM),  # bout
            g_spec,
        ],
        out_specs=[
            batch_blk(1),                       # dphi
            batch_blk(D),                       # ddx
            batch_blk(1),                       # dsc
            batch_blk(L),                       # dz
            pl.BlockSpec((D, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((int(n_layers), H, H), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((int(n_layers), H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), full, memory_space=pltpu.VMEM),  # dwout
            pl.BlockSpec((1, C), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, L), jnp.float32),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((L, H), jnp.float32),
            jax.ShapeDtypeStruct((int(n_layers), H, H), jnp.float32),
            jax.ShapeDtypeStruct((int(n_layers), H), jnp.float32),
            jax.ShapeDtypeStruct((H, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
    )(grid_p, phi_p, dx_p, sc_p, z_p, Wc, bc2, Wz, hw, hb, wout.T, bout2, g_p)
    (dphi, ddx, dsc, dz, dwc, dbc, dwz, dhw, dhb, dwout, dbout) = outs
    return (None,                      # grid
            dphi[:B, 0], ddx[:B], dsc[:B, 0], dz[:B],
            dwc, dbc[0], dwz, dhw, dhb, dwout,
            dbout.reshape(jnp.shape(bout)))


# Forward routing: XLA's own fusion BEATS the handwritten forward kernel
# below ~0.5M decode elements (B=200, N=784: XLA 95 us vs Pallas 170 us),
# while the VMEM-resident kernel wins above it ONLY when its tile padding
# is small — measured sweep (scan harness, us/step):
#   B*N=262k pad=1.0: XLA 188  / Pallas 220      -> XLA
#   B*N=512k pad=1.0: XLA 475-490 / Pallas 438   -> Pallas
#   B*N=784k pad=1.31 (N=784): XLA 691 / Pallas 854   -> XLA
#   B*N=1.57M pad=1.31 (N=784): XLA 1438 / Pallas 1707 -> XLA
#   B*N=2.1M pad=1.0 (N=65536): XLA 1997 / Pallas 1747 -> Pallas
# i.e. the kernel's cost tracks PADDED elements (~0.83 us/k) while XLA's
# tracks real elements (~0.9 us/k at size) — so Pallas pays off only when
# round_up(B,B_T)*round_up(N,n_t) stays within ~10% of B*N. The custom
# Pallas BACKWARD always wins (~1.6-2.8x XLA autodiff) because it
# rematerializes tiles instead of saving activations to HBM, so the VJP
# routes only the forward and keeps the Pallas backward unconditionally.
XLA_FWD_MAX_BN = 1 << 19   # Pallas fwd needs at least this many REAL elements
                           # (512k itself measured Pallas-faster: 438 vs 475 us)
PALLAS_FWD_MAX_PAD = 1.1   # ... and at most ~10% tile-padding overhead

# Shape-aware gate for the whole fused TRAIN path (Pallas backward): XLA's
# fully-fused autodiff has a performance cliff once the [B*N, H] activation
# working set outgrows its fusion window — measured at N=784/H=128 on v5e:
# XLA fwd+bwd runs 281 us/step at B=128 (12.8M elements) but 1306 us at
# B=200 (20M). Below the cliff XLA beats the Pallas backward (403 us at
# B=128 with the best tile); above it the kernel wins 1.3-1.9x. All seven
# measured (B, N, C) configurations split cleanly on B*N*Hmax at ~13.5M.
FUSED_MIN_BNH = 13_500_000

_DEFAULTS.update(_VMEM_BUDGET=_VMEM_BUDGET, XLA_FWD_MAX_BN=XLA_FWD_MAX_BN,
                 PALLAS_FWD_MAX_PAD=PALLAS_FWD_MAX_PAD,
                 FUSED_MIN_BNH=FUSED_MIN_BNH)

# calibrate() probe chain length: calls per jitted fori_loop measurement
# (dispatch latency amortizes over the chain; see calibrate docstring).
_CAL_CHAIN = 50


def fused_profitable(rows: int, n_pixels: int, h_max: int) -> bool:
    """True when the Pallas train path is expected to beat XLA autodiff
    for a decode of ``rows`` latent rows over ``n_pixels`` grid points with
    a (padded) hidden width ``h_max``."""
    return rows * n_pixels * h_max >= _tuning().fused_min_bnh


def calibrate(verbose: bool = False) -> KernelTuning:
    """Measure THIS TPU generation once and register a tuning for it.

    For device kinds without a ``DEVICE_TUNINGS`` entry the module routes
    everything to XLA (correct but leaves kernel speedups on the table).
    This opt-in probe mirrors how the v5e entry was derived, at calibration
    cost of a handful of compiles (minutes on a cold compile cache):

    1. **VMEM row budget** — probed descending from 32 MB. Each trial
       budget is validated by compiling AND running the exact chained
       crossover programs step 2 times (probe-what-you-fly): a budget only
       counts if ``_select_tiles``' own choice under it survives the
       platform's scoped-VMEM limit inside the chained loop. The surviving
       budget's compiles stay warm in the cache, so step 2 pays no extra
       compiles.
    2. **Train-path crossover** (``fused_min_bnh``) — XLA autodiff vs the
       fused Pallas backward at a below-cliff and an above-cliff shape.
    3. **Forward crossover** (``xla_fwd_max_bn``) — XLA vs Pallas forward
       at a large pad-free shape.

    Registers the result under the current ``device_kind`` (which opens the
    model-level fusion gate, :func:`sdecoder_supports_fusion`) and returns
    it. Thresholds are coarse on purpose: routing only needs the right side
    of each crossover, not the exact knee.

    Latency immunity (round 4): every crossover probe chains ``_CAL_CHAIN``
    calls inside ONE jit with a genuine data dependence
    (``z_{i+1} = z_i + 1e-9 * dz_i`` — the technique from
    ``benchmarks/bwd_ablation.py``), so per-call time is
    (one dispatch + chain)/chain and dispatch latency — dominant on
    tunneled attachments at ~ms per call — amortizes away. A calibrate()
    run THROUGH the tunnel now resolves the same crossovers as a local
    attachment; the round-4 tunnel run reproduces the hand-measured v5e
    routing (log: ``benchmarks/logs/calibrate_tunnel_r04.log``).
    """
    import time as _time
    # A pre-existing entry (built-in or user-registered) is the fallback on
    # every failure path below: a failed re-calibration must not close the
    # gate on a platform that already had a validated tuning.
    prior = DEVICE_TUNINGS.get(_device_kind())
    H, nl = 128, 2
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)

    def weights(L=2):
        return (jax.random.normal(ks[0], (2, H)) * 0.1,      # Wc
                jnp.zeros((H,)),                              # bc
                jax.random.normal(ks[1], (L, H)) * 0.1,       # Wz
                jax.random.normal(ks[2], (nl, H, H)) * 0.05,  # hw
                jnp.zeros((nl, H)),                           # hb
                jax.random.normal(ks[3], (H, 1)) * 0.1,       # wout
                jnp.zeros(()))                                # bout

    def batch(B, N):
        return (jax.random.normal(ks[4], (N, 2)),
                jax.random.normal(ks[5], (B,)) * 0.1,
                jax.random.normal(ks[6], (B, 2)) * 0.1,
                1.0 + jax.random.normal(ks[7], (B,)) * 0.05,
                jax.random.normal(ks[8], (B, 2)))

    w = weights()

    def chain(step, z0):
        """One-jit chain of ``_CAL_CHAIN`` data-dependent calls of ``step``
        (z -> z, same shape): tunnel dispatch latency is paid once per
        measurement instead of once per call."""
        f = jax.jit(lambda z: jax.lax.fori_loop(
            0, _CAL_CHAIN, lambda _, zc: step(zc), z))
        return f, z0

    def warm(fz):
        f, z0 = fz
        jax.block_until_ready(f(z0))  # compile + warm
        return f, z0

    def timed(f, z0):
        """Per-call seconds of an already-warmed chained jit."""
        t0 = _time.perf_counter()
        jax.block_until_ready(f(z0))
        return (_time.perf_counter() - t0) / _CAL_CHAIN

    # The probe loss is shaped like the real train objective — Bernoulli
    # reconstruction with gradients for EVERY weight (the expensive dhw
    # accumulations), not a sum-of-output toy — so the crossovers reflect
    # the production path.
    def _recon(out, x):
        eps = 1e-7
        return -jnp.sum(x * jnp.log(out + eps)
                        + (1 - x) * jnp.log(1 - out + eps))

    def xla_grad_chain(B, N):
        grid, phi, dx, sc, z = batch(B, N)
        x = jax.random.uniform(ks[9], (B, N))
        g = jax.grad(lambda args: _recon(_xla_forward(
            grid, phi, dx, sc, args[0], *args[1], "tanh", True), x))
        # full weight grads each call (the expensive dhw accumulations);
        # only dz feeds the chain's data dependence
        return chain(lambda zc: zc + 1e-9 * g((zc, w))[0], z)

    def pallas_grad_chain(B, N, act="tanh"):
        grid, phi, dx, sc, z = batch(B, N)
        x = jax.random.uniform(ks[9], (B, N))
        # the custom-VJP op: routed forward + the Pallas backward kernel
        g = jax.grad(lambda args: _recon(fused_spatial_decoder(
            grid, phi, dx, sc, args[0], *args[1], act), x))
        return chain(lambda zc: zc + 1e-9 * g((zc, w))[0], z)

    # 1. VMEM budget, probed descending. Validation = compile AND run the
    # two chained Pallas crossover programs step 2 times, with the trial
    # budget registered so _select_tiles makes its real choice under it.
    # A budget whose selected tiles blow the platform's scoped-VMEM limit
    # fails HERE (cheap compile-time failure) instead of poisoning step 2
    # — the round-3 probe validated budgets with small forced tiles and
    # let the crossover compile OOM at 32 MB on a 16 MB-scoped platform.
    vmem, pallas_chains = _CONSERVATIVE_TUNING.vmem_budget, None
    try:
        for budget in (32, 24, 16, 12, 8):
            budget_b = budget * 1024 * 1024
            DEVICE_TUNINGS[_device_kind()] = KernelTuning(
                vmem_budget=budget_b, xla_fwd_max_bn=float("inf"),
                pallas_fwd_max_pad=1.1, fused_min_bnh=float("inf"))
            try:
                trial_chains = (warm(pallas_grad_chain(64, 784)),
                                warm(pallas_grad_chain(200, 784)))
                # The pre-grad-act config must fit under the budget too: its
                # captured act'(pre) stacks carry the largest per-row footprint
                # (v5e's hand-measured 16 MB budget was set by a gelu one-pass
                # scoped-VMEM OOM, not by tanh — _select_tiles docstring).
                warm(pallas_grad_chain(200, 784, act="gelu"))
                vmem, pallas_chains = budget_b, trial_chains
                break
            except Exception as e:  # compile/VMEM failure: shrink and retry
                if verbose:
                    print(f"calibrate: {budget} MB budget failed "
                          f"({type(e).__name__})")
    except BaseException:
        # an interrupt mid-probe (e.g. KeyboardInterrupt) must not leave an
        # UNVALIDATED trial budget registered — same rollback contract as
        # the step-2/3 block below
        if prior is not None:
            DEVICE_TUNINGS[_device_kind()] = prior
        else:
            DEVICE_TUNINGS.pop(_device_kind(), None)
        raise
    if verbose:
        print(f"calibrate: vmem_budget = {vmem // (1024*1024)} MB")
    if pallas_chains is None:  # kernel unusable here: keep the prior entry
        if prior is not None:
            DEVICE_TUNINGS[_device_kind()] = prior
            warnings.warn("calibrate(): the Pallas backward failed to compile"
                          " at every probed VMEM budget; keeping the existing "
                          f"{_device_kind()!r} tuning unchanged.")
            return prior
        DEVICE_TUNINGS.pop(_device_kind(), None)
        warnings.warn("calibrate(): the Pallas backward failed to compile "
                      "at every probed VMEM budget; keeping pure-XLA routing.")
        return _CONSERVATIVE_TUNING
    # The surviving trial stays registered so steps 2-3 compile under it;
    # rolled back if a later probe raises (the gate must not stay open on
    # a half-calibrated platform).

    # 2. Train-path crossover at N=784 (the flagship grid): BNH ~ 6.4M
    # (below the v5e cliff) and ~ 20M (above it). The Pallas chains are
    # already compiled + warm from the budget probe.
    try:
        lo_bnh, hi_bnh = 64 * 784 * H, 200 * 784 * H
        pallas_lo = timed(*pallas_chains[0]) < timed(*warm(xla_grad_chain(64, 784)))
        pallas_hi = timed(*pallas_chains[1]) < timed(*warm(xla_grad_chain(200, 784)))
        if pallas_lo and pallas_hi:
            fused_min = lo_bnh // 2
        elif pallas_hi:
            fused_min = int((lo_bnh * hi_bnh) ** 0.5)
        else:
            fused_min = float("inf")
        if verbose:
            print(f"calibrate: fused_min_bnh = {fused_min}")

        # 3. Forward crossover at a pad-free 1M-element shape — clearly
        # ABOVE the v5e 512k knee (probing AT the knee is a coin flip: the
        # round-4 tunnel run measured 972 vs 974 us at 512k). The chain
        # feeds a [B, L] slice of the [B, N] output back into z.
        grid_f, phi_f, dx_f, sc_f, z_f = batch(64, 16384)
        L_f = z_f.shape[-1]
        t_xla = timed(*warm(chain(lambda zc: zc + 1e-9 * _xla_forward(
            grid_f, phi_f, dx_f, sc_f, zc, *w, "tanh", True)[:, :L_f], z_f)))
        t_pal = timed(*warm(chain(lambda zc: zc + 1e-9 * _fwd(
            grid_f, phi_f, dx_f, sc_f, zc, *w)[:, :L_f], z_f)))
        fwd_max = (1 << 19) if t_pal < t_xla else float("inf")
        if verbose:
            print(f"calibrate: xla_fwd_max_bn = {fwd_max} "
                  f"(xla {t_xla*1e6:.0f} us vs pallas {t_pal*1e6:.0f} us)")
        t = KernelTuning(vmem_budget=vmem, xla_fwd_max_bn=fwd_max,
                         pallas_fwd_max_pad=1.1, fused_min_bnh=fused_min)
    except BaseException:
        # a half-calibrated platform must not keep the TRIAL entry open —
        # restore whatever was registered before the probe started
        if prior is not None:
            DEVICE_TUNINGS[_device_kind()] = prior
        else:
            DEVICE_TUNINGS.pop(_device_kind(), None)
        raise
    DEVICE_TUNINGS[_device_kind()] = t
    return t


def _xla_forward(grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout, bout,
                 act, sigmoid_out):
    """Pure-XLA forward with the kernel's activation/head variants (the
    generalized form of :func:`spatial_decoder_reference`)."""
    D = grid.shape[-1]
    if D == 2:
        c = jnp.cos(phi)[:, None]
        s = jnp.sin(phi)[:, None]
        gx, gy = grid[:, 0], grid[:, 1]
        cx = (gx[None] * c - gy[None] * s) * sc[:, None] + dx[:, 0:1]
        cy = (gx[None] * s + gy[None] * c) * sc[:, None] + dx[:, 1:2]
        coords = jnp.stack([cx, cy], -1)  # [B, N, 2]
    else:
        coords = grid[None] + dx[:, None, :]
    h = _h0_act(act, coords @ Wc + bc + (z @ Wz)[:, None, :])
    for i in range(hw.shape[0]):
        h = _act(act, h @ hw[i] + hb[i])
    out = h @ wout + bout
    if wout.shape[1] == 1:
        out = out[..., 0]
    return jax.nn.sigmoid(out) if sigmoid_out else out


def _forward(grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout, bout,
             act, sigmoid_out):
    B, N = z.shape[0], grid.shape[0]
    t = _tuning()
    tiles = _select_tiles(B, N, Wc.shape[1], hw.shape[0])
    padded = _round_up(B, tiles[0]) * _round_up(N, tiles[1])
    if B * N < t.xla_fwd_max_bn or padded > t.pallas_fwd_max_pad * B * N:
        return _xla_forward(grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout,
                            bout, act, sigmoid_out)
    return _fwd(grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout, bout,
                act, sigmoid_out, tiles=tiles)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def fused_spatial_decoder(grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout, bout,
                          act="tanh", sigmoid_out=True):
    """Fused transform+decode: returns [B, N] decoded values.

    Args:
        grid: [N, D] coordinate grid (D = 1 or 2).
        phi, sc: [B] rotation angles / scales (pass zeros/ones when unused).
        dx: [B, D] translations (already scaled by the translation prior).
        z: [B, L] content latents (with any conditional vector concatenated).
        Wc [D,H], bc [H]: coord head; Wz [L,H]: latent head (no bias).
        hw [n_layers,H,H], hb [n_layers,H]: hidden tanh layers.
        wout [H,1], bout []: sigmoid output head.
    """
    return _forward(grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout, bout,
                    act, sigmoid_out)


def _fwd_rule(grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout, bout,
              act, sigmoid_out):
    out = _forward(grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout, bout,
                   act, sigmoid_out)
    return out, (grid, phi, dx, sc, z, Wc, bc, Wz, hw, hb, wout, bout)


fused_spatial_decoder.defvjp(_fwd_rule, _bwd)


# ---------------------------------------------------------------------------
# Model integration helpers
# ---------------------------------------------------------------------------

def _fusion_work_ok(hidden) -> bool:
    """Unequal / non-128-aligned hidden widths are fused by zero-padding every
    layer to ``Hmax = round_up(max(hidden), 128)`` (see
    :func:`_padded_sdecoder_weights`). Worth it only while the padded
    multiply-accumulate work stays within 2x the exact work, and while the
    kernel actually beats XLA at that width: measured on v5e, Hmax=128 wins
    1.3-1.4x and Hmax=256 wins 1.44x end-to-end, but at Hmax=512 the
    shrunken pixel tiles and VMEM pressure make the kernel a 1.35x
    PESSIMIZATION (27.5 vs 37.1 steps/s, 28x28 bs=200) — so wide hidden
    stacks route to XLA."""
    hmax = _round_up(max(hidden), 128)
    if hmax == 128:  # padding to the minimum lane width is always cheap
        return True
    exact = sum(a * b for a, b in zip((hidden[0],) + tuple(hidden[:-1]), hidden))
    return hmax <= 256 and len(hidden) * hmax * hmax <= 2 * exact


def sdecoder_supports_fusion(hidden_dim, activation: str, sigmoid_out: bool,
                             coord: int, channels: int = 1) -> bool:
    """True when an sDecoderNet config maps onto the fused kernel: hidden
    layers in any reference activation (``utils/nn.py:121-123`` — the
    tanh/relu/lrelu/softplus derivatives are recovered from the
    post-activation values the rematerializing backward keeps; gelu's is
    captured from the live pre-activation at one extra VMEM buffer per
    layer), an active coordinate transform, hidden widths whose pad-to-max
    overhead is acceptable (equal 128-aligned widths run unpadded), and a
    small channel count (the head is static-unrolled VPU lane-reduces, one
    per channel)."""
    hidden = tuple(hidden_dim) if hidden_dim is not None else (128, 128)
    del sigmoid_out  # both heads supported
    return (0 < coord < 5
            and activation in KERNEL_ACTS
            and 1 <= int(channels) <= 4
            and _fusion_work_ok(hidden)
            and jax.devices()[0].platform == "tpu"
            # unknown TPU generations route to XLA until a tuning exists
            # (register one in DEVICE_TUNINGS or run calibrate())
            and _device_kind() in DEVICE_TUNINGS)


def sdecoder_needs_padding(dec_params) -> bool:
    """True when :func:`_padded_sdecoder_weights` would zero-pad this
    sDecoderNet param pytree (unequal or non-lane-aligned hidden widths).
    Callers weighing a marginal optimization against padded MACs (e.g.
    the shared-coords enumerated decode) should skip it when this holds."""
    mlp = dec_params.get("MLP_0", {})
    widths = {k["kernel"].shape[j] for k in mlp.values() for j in (0, 1)}
    return len(widths) != 1 or next(iter(widths), 0) % 128 != 0


def _padded_sdecoder_weights(dec_params):
    """Extract (Wc, bc, Wz, hw, hb, wout, bout) from an sDecoderNet param
    pytree, zero-padding every hidden width to a common lane-aligned Hmax.

    Padding is exact, not approximate: padded lanes see zero weights in and
    zero bias, so they carry ``act(0) = 0`` (tanh/relu/lrelu/gelu) through
    every layer and contribute nothing to real lanes or to the output head, and
    their parameter gradients are identically zero. For softplus the padded
    lanes carry ``softplus(0) = log 2`` instead — still exact, because every
    weight OUT of a padded lane is zero (no contribution to real lanes or to
    the head, and real-lane cotangents never reach padded entries' inputs);
    the nonzero gradients that do land on padded weight ENTRIES are sliced
    away when autodiff through ``jnp.pad`` maps cotangents back to the
    original shapes.
    """
    mlp = dec_params["MLP_0"]
    n_layers = len(mlp)
    kernels = [mlp[f"Dense_{i}"]["kernel"] for i in range(n_layers)]
    biases = [mlp[f"Dense_{i}"]["bias"] for i in range(n_layers)]
    Wc = dec_params["fc_coord"]["kernel"]
    bc = dec_params["fc_coord"]["bias"]
    Wz = dec_params["fc_latent"]["kernel"]
    wout = dec_params["out"]["kernel"]
    bout = dec_params["out"]["bias"].reshape(-1)  # [C]
    widths = {Wc.shape[1], wout.shape[0],
              *(k.shape[0] for k in kernels), *(k.shape[1] for k in kernels)}
    hmax = _round_up(max(widths), 128)
    if len(widths) > 1 or max(widths) != hmax:
        pad_last = lambda a: jnp.pad(
            a, [(0, 0)] * (a.ndim - 1) + [(0, hmax - a.shape[-1])])
        Wc, bc, Wz = pad_last(Wc), pad_last(bc), pad_last(Wz)
        kernels = [jnp.pad(k, ((0, hmax - k.shape[0]), (0, hmax - k.shape[1])))
                   for k in kernels]
        biases = [pad_last(b) for b in biases]
        wout = jnp.pad(wout, ((0, hmax - wout.shape[0]), (0, 0)))
    return Wc, bc, Wz, jnp.stack(kernels), jnp.stack(biases), wout, bout


def apply_fused_sdecoder(dec_params, grid, phi, dx, sc, z,
                         act="tanh", sigmoid_out=True):
    """Run the fused kernel from an sDecoderNet parameter pytree
    (names: fc_coord, fc_latent, MLP_0/Dense_i, out). Leading batch dims of
    phi/dx/sc/z may be multi-dimensional (e.g. [K, B] under enumeration) —
    they are flattened for the kernel and restored on the output."""
    Wc, bc, Wz, hw, hb, wout, bout = _padded_sdecoder_weights(dec_params)
    batch_shape = z.shape[:-1]
    out = fused_spatial_decoder(
        grid,
        phi.reshape(-1),
        dx.reshape(-1, dx.shape[-1]),
        sc.reshape(-1),
        z.reshape(-1, z.shape[-1]),
        Wc, bc, Wz, hw, hb, wout, bout,
        act, sigmoid_out,
    )
    chan = (wout.shape[1],) if wout.shape[1] > 1 else ()
    return out.reshape(batch_shape + (grid.shape[0],) + chan)


# ---------------------------------------------------------------------------
# Fused train-gradient: forward + Bernoulli reconstruction loss + backward
# in a single kernel pass (saves the duplicate forward that the generic VJP
# pays for rematerialization).
# ---------------------------------------------------------------------------

def _train_call(grid, phi, dx, sc, z, x, wgt, Wc, bc, Wz, hw, hb, wout, bout,
                act):
    B, N = z.shape[0], grid.shape[0]
    D = grid.shape[1]
    H = Wc.shape[1]
    L = z.shape[1]
    n_layers = hw.shape[0]
    b_t, n_t = _select_tiles(B, N, H, n_layers, act)
    Bp, Np = _round_up(B, b_t), _round_up(N, n_t)

    grid_p = _pad_rows(grid, Np)
    z_p = _pad_rows(z, Bp)
    dx_p = _pad_rows(dx, Bp)
    phi_p = _pad_rows(phi[:, None], Bp)
    sc_p = _pad_rows(sc[:, None], Bp)
    x_p = jnp.zeros((Bp, Np), jnp.float32).at[:B, :N].set(x)
    wgt_p = _pad_rows(wgt[:, None].astype(jnp.float32), Bp)
    # pixel-validity mask (grid rows beyond N are padding)
    mask = (jnp.arange(Np) < N).astype(jnp.float32)[:, None]
    bc2 = bc[None, :]
    bout2 = jnp.asarray(bout, jnp.float32).reshape(1, 1)

    kernel = functools.partial(_bwd_kernel, int(n_layers), int(D), act,
                               True, True, 1)  # one-pass mode is C == 1 only
    full = lambda i, j: (0, 0)
    full3 = lambda i, j: (0, 0, 0)
    batch_blk = lambda w: pl.BlockSpec((b_t, w), lambda i, j: (i, 0),
                                       memory_space=pltpu.VMEM)
    outs = _pallas(
        kernel,
        grid=(Bp // b_t, Np // n_t),
        in_specs=[
            pl.BlockSpec((n_t, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            batch_blk(1), batch_blk(D), batch_blk(1), batch_blk(L),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wz
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wout^T
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # bout
            pl.BlockSpec((b_t, n_t), lambda i, j: (i, j), memory_space=pltpu.VMEM),  # x
            batch_blk(1),                                    # weights
            pl.BlockSpec((n_t, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),  # pixel mask
        ],
        out_specs=[
            batch_blk(1), batch_blk(D), batch_blk(1), batch_blk(L),
            pl.BlockSpec((D, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((int(n_layers), H, H), full3, memory_space=pltpu.VMEM),
            pl.BlockSpec((int(n_layers), H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), full, memory_space=pltpu.VMEM),  # dwout
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # loss
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bp, L), jnp.float32),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((L, H), jnp.float32),
            jax.ShapeDtypeStruct((int(n_layers), H, H), jnp.float32),
            jax.ShapeDtypeStruct((int(n_layers), H), jnp.float32),
            jax.ShapeDtypeStruct((H, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
    )(grid_p, phi_p, dx_p, sc_p, z_p, Wc, bc2, Wz, hw, hb, wout.T, bout2,
      x_p, wgt_p, mask)
    (dphi, ddx, dsc, dz, dwc, dbc, dwz, dhw, dhb, dwout, dbout, loss) = outs
    grads = (dphi[:B, 0], ddx[:B], dsc[:B, 0], dz[:B],
             dwc, dbc[0], dwz, dhw, dhb, dwout, dbout.reshape(()))
    return loss.reshape(()), grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(14,))
def fused_bernoulli_recon_loss(grid, phi, dx, sc, z, x, wgt,
                               Wc, bc, Wz, hw, hb, wout, bout, act="tanh"):
    """Weighted negative Bernoulli reconstruction log-likelihood
    ``-sum_b wgt_b * sum_n log p(x_bn | sigmoid(decode(...)_bn))`` computed
    with its gradients in ONE kernel pass. Valid when the result enters the
    training loss LINEARLY (which it does: the trainer sums weighted
    per-example losses), so the saved gradients are exact up to the scalar
    upstream cotangent."""
    loss, _ = _train_call(grid, phi, dx, sc, z, x, wgt, Wc, bc, Wz, hw, hb,
                          wout, bout, act)
    return loss


def _recon_loss_fwd(grid, phi, dx, sc, z, x, wgt, Wc, bc, Wz, hw, hb, wout,
                    bout, act):
    loss, grads = _train_call(grid, phi, dx, sc, z, x, wgt, Wc, bc, Wz, hw,
                              hb, wout, bout, act)
    return loss, grads


def _recon_loss_bwd(act, grads, ct):
    (dphi, ddx, dsc, dz, dwc, dbc, dwz, dhw, dhb, dwout, dbout) = grads
    s = lambda g: ct * g
    return (None, s(dphi), s(ddx), s(dsc), s(dz), None, None,
            s(dwc), s(dbc), s(dwz), s(dhw), s(dhb), s(dwout), s(dbout))


fused_bernoulli_recon_loss.defvjp(_recon_loss_fwd, _recon_loss_bwd)


def apply_fused_recon_loss(dec_params, grid, phi, dx, sc, z, x, wgt,
                           act="tanh"):
    """Weighted-recon-loss entry from an sDecoderNet parameter pytree
    (Bernoulli sampler + sigmoid head only)."""
    Wc, bc, Wz, hw, hb, wout, bout = _padded_sdecoder_weights(dec_params)
    return fused_bernoulli_recon_loss(
        grid, phi, dx, sc, z, x, wgt, Wc, bc, Wz, hw, hb, wout, bout, act)
