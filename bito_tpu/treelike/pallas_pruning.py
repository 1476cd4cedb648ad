"""Pallas TPU kernel for Felsenstein pruning.

The scan-tape path (pruning.py) updates an HBM-resident partials buffer one
row per step.  This kernel instead keeps the whole per-tree buffer in VMEM
(~3.5 MB at DS1 scale: 55 slots x 16 (cat*state) x 1024 patterns, f32) and
runs the entire postorder tape inside one kernel invocation per (tree,
pattern-tile) grid cell: HBM traffic drops to tips + 16x16 block-diagonal
transition matrices in and per-pattern log-likelihoods out.

Layout notes:
  - (category, state) fold into one 16-row axis so each evolve is a single
    16x16 @ 16xS dot (block-diagonal over categories, prepared host-side).
  - op tapes ride scalar prefetch (SMEM) and drive dynamic VMEM slices.
  - the grid's second axis tiles the pattern dimension so VMEM scratch fits
    regardless of alignment/pattern count.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _mxu_dot(a, b):
    """f32-accurate MXU matmul via 3-pass bf16 hi/lo splitting (the
    Precision.HIGH algorithm; the Pallas TPU lowering only offers DEFAULT
    -- single-pass bf16, 0.6% LL error at DS1 scale -- and HIGHEST -- 6
    passes, 2x the kernel time; a VPU broadcast-reduce measured 2x slower
    still).  hi is exactly representable in bf16, so hi@hi accumulates
    exactly; the two cross terms restore ~f32 accuracy (3e-6 rel on DS1
    log likelihoods vs the f32 scan path)."""
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_lo = b - b_hi
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def block_diag_transitions(P: jnp.ndarray) -> jnp.ndarray:
    """[..., C, A, A] -> [..., C*A, C*A] block diagonal."""
    *lead, C, A, _ = P.shape
    eye = jnp.eye(C, dtype=P.dtype)
    # out[..., c*A+a, d*A+b] = P[..., c, a, b] * (c == d)
    out = jnp.einsum("...cab,cd->...cadb", P, eye)
    return out.reshape(*lead, C * A, C * A)


def _hi(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _pair_evolve(P_ref, buf, e1, s1, e2, s2, L1, L2, bpair, CA):
    """Both evolves of one op as two block-diagonal MXU dots instead of six
    16-wide ones: ev = P_hi@b_hi + P_lo@b_hi + P_hi@b_lo (the 3-pass bf16
    hi/lo split), with {P1,P2} x {hi,lo} packed into one 4CAx2CA operand and
    the cross terms into one 2CAx2CA operand.  All operands are bf16-exact
    by construction so DEFAULT dot precision is lossless."""
    return _pair_dot(P_ref[0, e1], P_ref[0, e2],
                     buf[pl.ds(s1 * CA, CA), :], buf[pl.ds(s2 * CA, CA), :],
                     L1, L2, bpair, CA)


def _pair_dot(P1, P2, b1, b2, L1, L2, bpair, CA):
    """(P1 @ b1, P2 @ b2) at 3-pass bf16 accuracy in two block-diagonal
    dots (see _pair_evolve)."""
    P1h, P2h = _hi(P1), _hi(P2)
    L1[0:CA, 0:CA] = P1h
    L1[CA:2 * CA, 0:CA] = P1 - P1h
    L1[2 * CA:3 * CA, CA:2 * CA] = P2h
    L1[3 * CA:4 * CA, CA:2 * CA] = P2 - P2h
    L2[0:CA, 0:CA] = P1h
    L2[CA:2 * CA, CA:2 * CA] = P2h
    bpair[0:CA, :] = b1
    bpair[CA:2 * CA, :] = b2
    b = bpair[...]
    b_hi = _hi(b)
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    big = d(L1[...], b_hi)                         # [4CA, S]
    cross = d(L2[...], b - b_hi)                   # [2CA, S]
    ev1 = big[0:CA] + big[CA:2 * CA] + cross[0:CA]
    ev2 = big[2 * CA:3 * CA] + big[3 * CA:4 * CA] + cross[CA:2 * CA]
    return ev1, ev2


def _kernel(ops_ref, P_ref, tips_ref, piprop_ref, out_ref,
            buf, ls, L1, L2, bpair, *, M: int, T: int, CA: int, S_TILE: int,
            N1: int):
    # Initialize: all-ones buffer, tips in the first T slots, zero scales.
    buf[...] = jnp.ones_like(buf)
    buf[0:T * CA, :] = tips_ref[...]
    ls[...] = jnp.zeros_like(ls)
    L1[...] = jnp.zeros_like(L1)
    L2[...] = jnp.zeros_like(L2)

    def body(m, _):
        dest = ops_ref[0, m, 0]
        s1 = ops_ref[0, m, 1]
        e1 = ops_ref[0, m, 2]
        s2 = ops_ref[0, m, 3]
        e2 = ops_ref[0, m, 4]
        ev1, ev2 = _pair_evolve(P_ref, buf, e1, s1, e2, s2, L1, L2, bpair,
                                CA)
        prod = ev1 * ev2
        mx = jnp.max(prod, axis=0, keepdims=True)           # [1, S]
        mx = jnp.where(mx > 0, mx, 1.0)
        buf[pl.ds(dest * CA, CA), :] = prod / mx
        new_ls = (ls[pl.ds(s1, 1), :] + ls[pl.ds(s2, 1), :]
                  + jnp.log(mx))
        ls[pl.ds(dest, 1), :] = new_ls
        return 0

    jax.lax.fori_loop(0, M, body, 0)
    r = ops_ref[0, M, 0]  # root id rides as the tape's extra row
    pr = buf[pl.ds(r * CA, CA), :]                          # [CA, S]
    site = _mxu_dot(piprop_ref[...], pr)       # [1, S]
    out_ref[...] = (jnp.log(site) + ls[pl.ds(r, 1), :])[None]


@functools.partial(jax.jit, static_argnames=("num_slots", "category_count",
                                             "s_tile", "interpret"))
def pallas_log_likelihoods(
    post_ops,        # [B, M, 5] int32
    root,            # [B] int32
    P_blk,           # [B, N+1, CA, CA] f32 block-diagonal transitions
    tips_flat,       # [T*CA, S] f32
    piprop,          # [1, CA] f32: prop_c * pi_a flattened
    weights,         # [S]
    *, num_slots: int, category_count: int, s_tile: int = 512,
    interpret: bool = False,
):
    """Per-tree log likelihoods via the VMEM-resident kernel."""
    B, M, _ = post_ops.shape
    ops_ext = jnp.concatenate(
        [post_ops,
         jnp.broadcast_to(root.reshape(B, 1, 1), (B, 1, 5)).astype(
             post_ops.dtype)],
        axis=1,
    )
    CA = piprop.shape[1]
    T = tips_flat.shape[0] // CA
    S = tips_flat.shape[1]
    assert S % s_tile == 0, (S, s_tile)
    N1 = num_slots + 1
    grid = (B, S // s_tile)

    out = pl.pallas_call(
        functools.partial(_kernel, M=M, T=T, CA=CA, S_TILE=s_tile, N1=N1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, M + 1, 5), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N1, CA, CA), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T * CA, s_tile), lambda b, s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CA), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s_tile), lambda b, s: (b, 0, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, S), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N1 * CA, s_tile), jnp.float32),
            pltpu.VMEM((N1, s_tile), jnp.float32),
            pltpu.VMEM((4 * CA, 2 * CA), jnp.float32),
            pltpu.VMEM((2 * CA, 2 * CA), jnp.float32),
            pltpu.VMEM((2 * CA, s_tile), jnp.float32),
        ],
        interpret=interpret,
    )(ops_ext, P_blk, tips_flat, piprop)
    return out[:, 0, :] @ weights


def _grad_kernel(ops_ref, pre_ref, P_ref, dP_ref, tips_ref, pivec_ref,
                 propvec_ref, w_ref, ll_ref, grad_ref, buf, up,
                 ls, L1, L2, bpair, *, M: int, Mp: int, T: int, CA: int,
                 N1: int):
    """Postorder + root LL + preorder outside vectors + per-edge gradient
    rows, all VMEM-resident (the gradient analogue of _kernel; reference
    beagleCalculateEdgeDerivatives, src/fat_beagle.cpp:141-169).

    Per preorder op (dest, parent, sib1, e1, sib2, e2):
      o      = up[parent] * (P[e1] @ buf[sib1]) * (P[e2] @ buf[sib2])
      ratio  = (propvec . (o * (dP[dest] @ p_dest)))
             / (propvec . (o * ( P[dest] @ p_dest)))   -- scale-free
      grad_ref[dest] = w * ratio ; up[dest] = P[dest]^T @ o
    """
    # --- postorder (identical to _kernel) -----------------------------
    buf[...] = jnp.ones_like(buf)
    buf[0:T * CA, :] = tips_ref[...]
    ls[...] = jnp.zeros_like(ls)
    L1[...] = jnp.zeros_like(L1)
    L2[...] = jnp.zeros_like(L2)

    def body(m, _):
        dest = ops_ref[0, m, 0]
        s1 = ops_ref[0, m, 1]
        e1 = ops_ref[0, m, 2]
        s2 = ops_ref[0, m, 3]
        e2 = ops_ref[0, m, 4]
        ev1, ev2 = _pair_evolve(P_ref, buf, e1, s1, e2, s2, L1, L2, bpair,
                                CA)
        prod = ev1 * ev2
        mx = jnp.max(prod, axis=0, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        buf[pl.ds(dest * CA, CA), :] = prod / mx
        ls[pl.ds(dest, 1), :] = (ls[pl.ds(s1, 1), :] + ls[pl.ds(s2, 1), :]
                                 + jnp.log(mx))
        return 0

    jax.lax.fori_loop(0, M, body, 0)
    root = ops_ref[0, M, 0]
    piprop = pivec_ref[...] * propvec_ref[...]              # [1, CA]
    pr = buf[pl.ds(root * CA, CA), :]
    site = _mxu_dot(piprop, pr)
    ll_ref[...] = (jnp.log(site) + ls[pl.ds(root, 1), :])[None]

    # --- preorder + gradient rows --------------------------------------
    grad_ref[...] = jnp.zeros_like(grad_ref)
    up[...] = jnp.zeros_like(up)
    pivec_col = pivec_ref[...].reshape(CA, 1)               # [CA, 1]
    up[pl.ds(root * CA, CA), :] = jnp.broadcast_to(
        pivec_col, up[pl.ds(root * CA, CA), :].shape
    )
    propvec = propvec_ref[...]                              # [1, CA]
    w = w_ref[...]                                          # [1, S]

    def pre_body(m, _):
        dest = pre_ref[0, m, 0]
        parent = pre_ref[0, m, 1]
        s1 = pre_ref[0, m, 2]
        e1 = pre_ref[0, m, 3]
        s2 = pre_ref[0, m, 4]
        e2 = pre_ref[0, m, 5]
        ev1, ev2 = _pair_evolve(P_ref, buf, e1, s1, e2, s2, L1, L2, bpair,
                                CA)
        o = up[pl.ds(parent * CA, CA), :] * ev1 * ev2       # [CA, S]
        mx = jnp.max(o, axis=0, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        o = o / mx
        p = buf[pl.ds(dest * CA, CA), :]
        Pd = P_ref[0, dest]
        # P@p and dP@p fused into the same pair of block-diagonal dots.
        Pp, dPp = _pair_dot(Pd, dP_ref[0, dest], p, p, L1, L2, bpair, CA)
        den = _mxu_dot(propvec, o * Pp)                     # [1, S]
        num = _mxu_dot(propvec, o * dPp)
        den = jnp.where(den > 0, den, 1.0)
        grad_ref[0, pl.ds(dest, 1), :] = w * num / den
        # up[dest] = Pd^T @ o, hi/lo fused: [P_hi; P_lo] @ o_hi + P_hi @ o_lo.
        Pt = Pd.T
        Pth = _hi(Pt)
        L1[0:CA, 0:CA] = Pth
        L1[CA:2 * CA, 0:CA] = Pt - Pth
        o_hi = _hi(o)
        d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
        big = d(L1[0:2 * CA, 0:CA], o_hi)
        up[pl.ds(dest * CA, CA), :] = (big[0:CA] + big[CA:2 * CA]
                                       + d(Pth, o - o_hi))
        return 0

    jax.lax.fori_loop(0, Mp, pre_body, 0)


@functools.partial(jax.jit, static_argnames=("num_slots", "category_count",
                                             "s_tile", "interpret"))
def pallas_ll_and_gradients(
    post_ops,        # [B, M, 5] int32
    pre_ops,         # [B, Mp, 6] int32
    root,            # [B] int32
    edge_mask,       # [B, N] f32
    P_blk,           # [B, N+1, CA, CA] f32
    dP_blk,          # [B, N+1, CA, CA] f32
    tips_flat,       # [T*CA, S] f32
    pivec,           # [1, CA] f32: pi_a tiled per category
    propvec,         # [1, CA] f32: prop_c repeated per state
    weights,         # [S] f32 (0 on padding)
    *, num_slots: int, category_count: int, s_tile: int = 512,
    interpret: bool = False,
):
    """Per-tree (log likelihood [B], branch gradients [B, N]) via the
    VMEM-resident kernel."""
    B, M, _ = post_ops.shape
    Mp = pre_ops.shape[1]
    ops_ext = jnp.concatenate(
        [post_ops,
         jnp.broadcast_to(root.reshape(B, 1, 1), (B, 1, 5)).astype(
             post_ops.dtype)],
        axis=1,
    )
    CA = pivec.shape[1]
    T = tips_flat.shape[0] // CA
    S = tips_flat.shape[1]
    assert S % s_tile == 0, (S, s_tile)
    N1 = num_slots + 1
    NP = -(-N1 // 8) * 8   # pad the gradient-row axis to the f32 sublane
    w2 = weights.reshape(1, S)
    grid = (B, S // s_tile)

    ll, wgrad = pl.pallas_call(
        functools.partial(_grad_kernel, M=M, Mp=Mp, T=T, CA=CA, N1=N1),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, M + 1, 5), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Mp, 6), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N1, CA, CA), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1, CA, CA), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T * CA, s_tile), lambda b, s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CA), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CA), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_tile), lambda b, s: (0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, s_tile), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NP, s_tile), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((B, NP, S), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N1 * CA, s_tile), jnp.float32),
            pltpu.VMEM((N1 * CA, s_tile), jnp.float32),
            pltpu.VMEM((N1, s_tile), jnp.float32),
            pltpu.VMEM((4 * CA, 2 * CA), jnp.float32),
            pltpu.VMEM((2 * CA, 2 * CA), jnp.float32),
            pltpu.VMEM((2 * CA, s_tile), jnp.float32),
        ],
        interpret=interpret,
    )(ops_ext, pre_ops, P_blk, dP_blk, tips_flat, pivec, propvec, w2)
    ll_total = ll[:, 0, :] @ weights
    grads = wgrad.sum(axis=2)[:, :num_slots] * edge_mask
    return ll_total, grads


def prepare_inputs(enc, tip_partials, weights, eig, category_rates,
                   category_proportions, clock_rate, branch_lengths,
                   pattern_pad: int, Q=None):
    """Host-side packing for the kernel from the standard engine inputs.
    tip_partials: [T, S0, A]; returns kernel args.  Q (shared [A, A])
    routes transition matrices through uniformization (codon models —
    see pruning.transition_matrices_ext)."""
    from . import pruning

    C = category_rates.shape[-1]
    A = tip_partials.shape[-1]  # 4 (nucleotide) or 64 (padded codon)
    CA = C * A
    P = pruning.transition_matrices_ext(
        eig, branch_lengths, category_rates, clock_rate, Q=Q
    )  # [B, N+1, C, A, A]
    P_blk = block_diag_transitions(P).astype(jnp.float32)
    T, S0, _ = tip_partials.shape
    tips = jnp.ones((T, C, A, pattern_pad), dtype=jnp.float32)
    tips = tips.at[:, :, :, :S0].set(
        jnp.broadcast_to(
            jnp.swapaxes(tip_partials, 1, 2)[:, None, :, :S0],
            (T, C, A, min(S0, pattern_pad)),
        )
    )
    tips_flat = tips.reshape(T * CA, pattern_pad)
    piprop = (category_proportions[0][:, None]
              * eig.pi[0][None, :]).reshape(1, CA).astype(jnp.float32)
    w = jnp.zeros((pattern_pad,), jnp.float32).at[:S0].set(
        jnp.asarray(weights[:S0], jnp.float32)
    )
    return P_blk, tips_flat, piprop, w


def prepare_inputs_grad_q(enc, tip_partials, weights, eig, category_rates,
                          category_proportions, clock_rate, branch_lengths,
                          pattern_pad: int, Q=None):
    """prepare_inputs_grad with the derivative matrices built from the
    dP = rate*clock * Q P identity: one small einsum against the per-tree
    category-block Q instead of a second eigendecomposition pass over
    every edge (~halves the XLA-side gradient prep).

    Q (shared [A, A], optional): use the model's structural rate matrix
    directly (and uniformized P) instead of reconstructing Q from the
    eigensystem — for codon models the eigen reconstruction's signed
    cancellation makes small Q/P entries f32 noise (round-5 finding)."""
    P_blk, tips_flat, _piprop, w = prepare_inputs(
        enc, tip_partials, weights, eig, category_rates,
        category_proportions, clock_rate, branch_lengths, pattern_pad,
        Q=Q,
    )
    B, C = category_rates.shape
    A = eig.U.shape[-1]  # 4 (nucleotide) or 64 (padded codon)
    # HIGHEST precision: TPU einsums default to single-pass bf16 (~2^-8),
    # which put a 4.5e-3 error on every gradient until the bench parity
    # guard caught it.
    hp = jax.lax.Precision.HIGHEST
    if Q is not None:
        Qb = jnp.broadcast_to(Q.astype(P_blk.dtype), (B, A, A))
    else:
        Qb = jnp.einsum("bij,bj,bjk->bik", eig.U, eig.values, eig.U_inv,
                        precision=hp)
    QC = jnp.einsum("bc,bik->bcik",
                    category_rates * clock_rate[:, None], Qb)  # [B,C,A,A]
    eye = jnp.eye(C, dtype=Qb.dtype)
    Qcat = jnp.einsum("bcik,cd->bcidk", QC, eye).reshape(
        B, C * A, C * A).astype(jnp.float32)
    dP_blk = jnp.einsum("bij,bnjk->bnik", Qcat, P_blk, precision=hp)
    # zero the identity pad at index N (d/dbl of "no edge" is zero)
    dP_blk = dP_blk.at[:, -1].set(0.0)
    pivec = jnp.tile(eig.pi[0], C).reshape(1, C * A).astype(jnp.float32)
    propvec = jnp.repeat(category_proportions[0], A).reshape(
        1, C * A
    ).astype(jnp.float32)
    return P_blk, dP_blk, tips_flat, pivec, propvec, w


def prepare_inputs_grad(enc, tip_partials, weights, eig, category_rates,
                        category_proportions, clock_rate, branch_lengths,
                        pattern_pad: int):
    """Host-side packing for the LL+gradient kernel: the prepare_inputs
    bundle plus block-diagonal dP and the per-folded-row pi / proportion
    vectors."""
    from . import pruning

    P_blk, tips_flat, _piprop, w = prepare_inputs(
        enc, tip_partials, weights, eig, category_rates,
        category_proportions, clock_rate, branch_lengths, pattern_pad,
    )
    dP = pruning.transition_matrices_ext(
        eig, branch_lengths, category_rates, clock_rate, derivative=True
    )
    dP_blk = block_diag_transitions(dP).astype(jnp.float32)
    C = category_rates.shape[-1]
    A = eig.pi.shape[-1]  # 4 (nucleotide) or 64 (padded codon)
    pivec = jnp.tile(eig.pi[0], C).reshape(1, C * A).astype(jnp.float32)
    propvec = jnp.repeat(category_proportions[0], A).reshape(
        1, C * A
    ).astype(jnp.float32)
    return P_blk, dP_blk, tips_flat, pivec, propvec, w
