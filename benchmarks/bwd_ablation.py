"""Backward-kernel stall attribution (VERDICT r2 next-step #2).

The fused spatial-decoder backward runs at ~32% MFU on the flagship shape;
this harness attributes the non-MXU time by MEASURED ABLATION instead of a
fitted cost model: it times stripped-down variants of the exact backward
kernel (same grid, same BlockSpecs, same tiles) and reads the component
costs off the differences:

  full        the production backward (copy of ops/spatial_decoder._bwd_kernel,
              C=1 path) — the baseline
  fwd_remat   only the forward recompute (h0 + hidden matmuls + tanh),
              outputs a reduction of the last hidden state
  fwd_noact   fwd_remat with identity activations — isolates the
              transcendental (tanh) VPU cost from the matmul cost
  no_breduce  full minus the per-batch unrolled slice-reduce loop for
              du/dv/dw (replaced by whole-tile reduces — wrong numerics,
              same memory traffic class) — isolates that VPU loop
  dma_floor   reads every input block, writes every output block, compute
              limited to one add — the DMA + grid-overhead floor

Attribution then reads:
  backprop-half cost   = full - fwd_remat
  tanh cost            = fwd_remat - fwd_noact
  per-batch reduce     = full - no_breduce
  DMA/overhead floor   = dma_floor

Timing: each variant runs CHAIN_LEN times inside one jitted fori_loop with
a genuine data dependence between iterations (dz feeds back into z), so
one wall-clocked dispatch amortizes the ~30 ms tunnel latency and XLA
cannot hoist the loop-invariant call.

Usage: python benchmarks/bwd_ablation.py [--B 200] [--N 784]
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import pyroved_tpu as pv  # noqa: E402
from pyroved_tpu.ops import spatial_decoder as sd  # noqa: E402

CHAIN_LEN = 200


def _variant_kernel(n_layers, mode, *refs):
    """One kernel, five ablation modes. Mirrors _bwd_kernel's C==1 2-D
    path; see module docstring for what each mode strips."""
    (grid_ref, phi_ref, dx_ref, sc_ref, z_ref,
     wc_ref, bc_ref, wz_ref, hw_ref, hb_ref, wout_ref, bout_ref,
     g_ref,
     dphi_ref, ddx_ref, dsc_ref, dz_ref,
     dwc_ref, dbc_ref, dwz_ref, dhw_ref, dhb_ref, dwout_ref,
     dbout_ref) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)

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
        dbout_ref[0, 0] = 0.0

    if mode == "dma_floor":
        # touch every input block; one add so nothing is DCE'd
        s = (jnp.sum(grid_ref[:]) + jnp.sum(z_ref[:]) + jnp.sum(wc_ref[:])
             + jnp.sum(wz_ref[:]) + jnp.sum(hw_ref[:]) + jnp.sum(g_ref[:])
             + jnp.sum(phi_ref[:]) + jnp.sum(dx_ref[:]) + jnp.sum(sc_ref[:])
             + jnp.sum(bc_ref[:]) + jnp.sum(hb_ref[:]) + jnp.sum(wout_ref[:]))
        dz_ref[:] += s
        return

    act = "tanh" if mode != "fwd_noact" else "relu_id"

    def hid_act(x):
        return jnp.tanh(x) if act == "tanh" else x

    # ---- forward recompute (shared by all remaining modes) ----
    gx = grid_ref[:, 0]
    z = z_ref[:]
    wc = wc_ref[:]
    bc = bc_ref[:]
    w_vec = dx_ref[:] @ wc + bc + z @ wz_ref[:]
    gy = grid_ref[:, 1]
    c = jnp.cos(phi_ref[:])
    s = jnp.sin(phi_ref[:])
    sc = sc_ref[:]
    a0 = c * wc[0:1, :] + s * wc[1:2, :]
    a1 = -s * wc[0:1, :] + c * wc[1:2, :]
    u = sc * a0
    v = sc * a1
    pre0 = (gx[None, :, None] * u[:, None, :]
            + gy[None, :, None] * v[:, None, :]
            + w_vec[:, None, :])
    h0 = hid_act(pre0)
    bt, nt, H = h0.shape
    hs = [h0.reshape(bt * nt, H)]
    for l in range(n_layers):
        hs.append(hid_act(sd._mxu_dot(hs[-1], hw_ref[l]) + hb_ref[l]))
    hf = hs[-1].reshape(bt, nt, H)

    if mode in ("fwd_remat", "fwd_noact"):
        # cheap dependence on the recompute so Mosaic keeps it all
        # (2-D full-sublane reduces only — Mosaic restriction notes)
        dwout_ref[0:1, :] += jnp.sum(hs[-1], axis=0, keepdims=True)
        dz_ref[:] += jnp.sum(hs[-1])
        return

    # ---- full backprop (modes: full, full_dg, no_breduce) ----
    def mm_at_b(a, b):
        """a^T @ b without materializing the [H, BN] transpose: contract
        the sublane (row) axis of both operands directly on the MXU."""
        if sd.BF16_MATMUL:
            a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    logit = jnp.sum(hf * wout_ref[0:1, :], axis=-1) + bout_ref[0, 0]
    out = jax.nn.sigmoid(logit)
    dl2 = g_ref[:] * out * (1.0 - out)
    dbout_ref[0, 0] += jnp.sum(dl2)
    dl_bn = jnp.broadcast_to(dl2[..., None], (bt, nt, H)).reshape(bt * nt, H)
    if mode == "mxu_dwout":
        # dwout as an MXU contraction instead of the VPU mult+reduce pair:
        # every column of dl_bn is dl2 flat, so hs[-1]^T @ dl_bn[:, 0:1]
        # is exactly dwout^T, computed on the MXU (127/128 lanes idle but
        # zero VPU [BN, H] passes). [H, 1] result can't be stored into the
        # [1, H] ref without a lane<->sublane move, so for TIMING the
        # variant keeps only a scalar dependence — the question measured
        # is purely "is the MXU form cheaper than the two VPU passes".
        dz_ref[:] += jnp.sum(mm_at_b(hs[-1], dl_bn[:, 0:1]))
    else:
        dwout_ref[0:1, :] += jnp.sum(hs[-1] * dl_bn, axis=0, keepdims=True)
    dh = dl_bn * wout_ref[0:1, :]

    def mm_bt(a, b):
        """a @ b^T via lane-axis contraction (A B^T MXU form)."""
        if sd.BF16_MATMUL:
            a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    for l in range(n_layers - 1, -1, -1):
        post = hs[l + 1]
        d_pre = dh * (1.0 - post * post)
        if mode == "full_dg":
            dhw_ref[l] += mm_at_b(hs[l], d_pre)
            dhb_ref[l] += jnp.sum(d_pre, axis=0)
            dh = mm_bt(d_pre, hw_ref[l])
        elif mode == "mxu_dhb":
            # per-layer bias grads as a ones^T @ d_pre MXU contraction
            # instead of the [BN, H] axis-0 VPU reduce
            dhw_ref[l] += sd._mxu_dot(hs[l].T, d_pre)
            ones = jnp.ones((d_pre.shape[0], 1), d_pre.dtype)
            dhb_ref[l] += sd._mxu_dot_at(d_pre, ones)[:, 0]
            dh = sd._mxu_dot(d_pre, hw_ref[l].T)
        else:
            dhw_ref[l] += sd._mxu_dot(hs[l].T, d_pre)
            dhb_ref[l] += jnp.sum(d_pre, axis=0)
            dh = sd._mxu_dot(d_pre, hw_ref[l].T)
    h0f = hs[0]
    d0 = dh * (1.0 - h0f * h0f)

    gxc = grid_ref[:, 0:1]
    gyc = grid_ref[:, 1:2]
    if mode == "no_breduce":
        # whole-tile reduces: WRONG numerics, same traffic class — the
        # ablation isolates the unrolled per-batch slice loop's cost
        tot = jnp.sum(d0, axis=0, keepdims=True)
        dw_vec = jnp.broadcast_to(tot, (bt, H))
        du = jnp.broadcast_to(jnp.sum(gxc * d0[:nt, :], axis=0,
                                      keepdims=True), (bt, H))
        dv = jnp.broadcast_to(jnp.sum(gyc * d0[:nt, :], axis=0,
                                      keepdims=True), (bt, H))
    else:
        dw_rows, du_rows, dv_rows = [], [], []
        for b in range(bt):
            sl = d0[b * nt:(b + 1) * nt, :]
            dw_rows.append(jnp.sum(sl, axis=0, keepdims=True))
            du_rows.append(jnp.sum(gxc * sl, axis=0, keepdims=True))
            dv_rows.append(jnp.sum(gyc * sl, axis=0, keepdims=True))
        dw_vec = jnp.concatenate(dw_rows, axis=0)
        du = jnp.concatenate(du_rows, axis=0)
        dv = jnp.concatenate(dv_rows, axis=0)

    dz_ref[:] += jnp.dot(dw_vec, wz_ref[:].T,
                         preferred_element_type=jnp.float32)
    dwz_ref[:] += jnp.dot(z.T, dw_vec, preferred_element_type=jnp.float32)
    dbc_ref[:] += jnp.sum(dw_vec, axis=0, keepdims=True)
    ddx_ref[:] += dw_vec @ wc.T
    dsc_ref[:] += (jnp.sum(du * a0, -1, keepdims=True)
                   + jnp.sum(dv * a1, -1, keepdims=True))
    dphi_ref[:] += (jnp.sum(du * v, -1, keepdims=True)
                    - jnp.sum(dv * u, -1, keepdims=True))
    dwc0 = (jnp.dot((sc * c).T, du, preferred_element_type=jnp.float32)
            - jnp.dot((sc * s).T, dv, preferred_element_type=jnp.float32)
            + jnp.dot(dx_ref[:][:, 0:1].T, dw_vec,
                      preferred_element_type=jnp.float32))
    dwc1 = (jnp.dot((sc * s).T, du, preferred_element_type=jnp.float32)
            + jnp.dot((sc * c).T, dv, preferred_element_type=jnp.float32)
            + jnp.dot(dx_ref[:][:, 1:2].T, dw_vec,
                      preferred_element_type=jnp.float32))
    dwc_ref[:] += jnp.concatenate([dwc0, dwc1], axis=0)


def build_call(mode, B, N, H, L, n_layers, b_t, n_t):
    Bp, Np = sd._round_up(B, b_t), sd._round_up(N, n_t)
    D = 2

    def call(grid_p, phi_p, dx_p, sc_p, z_p, Wc, bc2, Wz, hw, hb, woutT,
             bout2, g_p):
        kernel = functools.partial(_variant_kernel, n_layers, mode)
        full = lambda i, j: (0, 0)
        full3 = lambda i, j: (0, 0, 0)
        batch_blk = lambda w: pl.BlockSpec((b_t, w), lambda i, j: (i, 0),
                                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            interpret=bool(os.environ.get("PVT_INTERPRET")),
            grid=(Bp // b_t, Np // n_t),
            in_specs=[
                pl.BlockSpec((n_t, D), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                batch_blk(1), batch_blk(D), batch_blk(1), batch_blk(L),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                pl.BlockSpec((b_t, n_t), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                batch_blk(1), batch_blk(D), batch_blk(1), batch_blk(L),
                pl.BlockSpec((D, H), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((L, H), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((n_layers, H, H), full3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_layers, H), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
                jax.ShapeDtypeStruct((Bp, D), jnp.float32),
                jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
                jax.ShapeDtypeStruct((Bp, L), jnp.float32),
                jax.ShapeDtypeStruct((D, H), jnp.float32),
                jax.ShapeDtypeStruct((1, H), jnp.float32),
                jax.ShapeDtypeStruct((L, H), jnp.float32),
                jax.ShapeDtypeStruct((n_layers, H, H), jnp.float32),
                jax.ShapeDtypeStruct((n_layers, H), jnp.float32),
                jax.ShapeDtypeStruct((1, H), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ],
        )(grid_p, phi_p, dx_p, sc_p, z_p, Wc, bc2, Wz, hw, hb, woutT, bout2,
          g_p)

    return call


def time_variant(mode, B, N, H=128, L=4, n_layers=2):
    b_t, n_t = sd._select_tiles(B, N, H, n_layers)
    Bp, Np = sd._round_up(B, b_t), sd._round_up(N, n_t)
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
    grid_p = mk(Np, 2)
    phi_p, sc_p = mk(Bp, 1), 1.0 + mk(Bp, 1)
    dx_p = mk(Bp, 2)
    z0 = mk(Bp, L)
    Wc, bc2, Wz = mk(2, H), mk(1, H), mk(L, H)
    hw, hb = mk(n_layers, H, H), mk(n_layers, H)
    woutT, bout2 = mk(1, H), mk(1, 1)
    g_p = mk(Bp, Np)

    call = build_call(mode, B, N, H, L, n_layers, b_t, n_t)

    def chained(z):
        def body(_, zc):
            outs = call(grid_p, phi_p, dx_p, sc_p, zc, Wc, bc2, Wz, hw, hb,
                        woutT, bout2, g_p)
            dz = outs[3]
            # genuine data dependence: next iteration's z comes from dz
            return zc + 1e-9 * dz
        return jax.lax.fori_loop(0, CHAIN_LEN, body, z)

    f = jax.jit(chained)
    jax.block_until_ready(f(z0))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(f(z0))
    us = (time.perf_counter() - t0) / CHAIN_LEN * 1e6
    print(f"  {mode:10s} {us:8.1f} us/call  (tiles ({b_t},{n_t}))",
        flush=True)
    return us


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=200)
    ap.add_argument("--N", type=int, default=784)
    ap.add_argument("--H", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    args = ap.parse_args(argv)
    pv.utils.profiling.enable_compilation_cache()
    print(f"backward ablation at B={args.B} N={args.N} H={args.H} "
          f"nl={args.layers} (chain {CHAIN_LEN}):")
    t = {}
    for mode in ("dma_floor", "fwd_noact", "fwd_remat", "no_breduce", "full",
                 "full_dg", "mxu_dwout", "mxu_dhb"):
        t[mode] = time_variant(mode, args.B, args.N, args.H,
                               n_layers=args.layers)
    print("\nattribution:")
    print(f"  DMA + grid overhead floor : {t['dma_floor']:8.1f} us")
    print(f"  fwd recompute (remat)     : {t['fwd_remat']:8.1f} us "
          f"(tanh part {t['fwd_remat'] - t['fwd_noact']:+.1f})")
    print(f"  backprop half             : {t['full'] - t['fwd_remat']:8.1f} us")
    print(f"  per-batch reduce loop     : {t['full'] - t['no_breduce']:8.1f} us")
    print(f"  transpose-free dot_general: {t['full_dg']:8.1f} us "
          f"({t['full'] - t['full_dg']:+.1f} vs full)")
    print(f"  dwout on MXU              : {t['mxu_dwout']:8.1f} us "
          f"({t['full'] - t['mxu_dwout']:+.1f} vs full; positive = the "
          f"MXU form saves VPU time)")
    print(f"  dhb on MXU (ones^T @ dpre): {t['mxu_dhb']:8.1f} us "
          f"({t['full'] - t['mxu_dhb']:+.1f} vs full)")
    # MXU-bound reference: fwd 3 matmul-equivalents, bwd ~2x fwd
    return 0


if __name__ == "__main__":
    sys.exit(main())
