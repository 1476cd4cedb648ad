"""Paired-slot Pallas TPU kernel for Felsenstein pruning (kernel v2/v3).

The round-2 kernel (pallas_pruning.py) was latency-bound, not MXU- or
bandwidth-bound: profiling on v5e (scripts/perf_lab.py + perf_paired.py,
round 3) showed ~0.55 us per tape op regardless of the op's arithmetic
(removing every matmul saved 18%; halving the pattern tile made it slower;
an LL-only pass ran 3.2x faster purely from having fewer ops).  The cost is
the serialized store->load dependency chain through the dynamically-indexed
VMEM partials buffer.  This kernel attacks the chain structurally:

  - **Paired slot layout.** The partials buffer is laid out so that op m's
    two children always occupy rows [2m*CA, (2m+2)*CA): the slot of a node
    is *the position where its parent consumes it*.  Both evolves of an op
    read ONE contiguous [2*CA, S] slice and feed ONE block-diagonal dot —
    no operand staging.
  - **Paired preorder pass.** One outside-pass op per *postorder op* (not
    per edge): both siblings' outside vectors, gradient rows, and
    upward-vector pair are produced together from the same pair rows, in
    reverse tape order.  The up buffer uses the same paired layout, so a
    node's outside value is written exactly where its own op reads it.
    Multifurcating-root accumulator chains fall out of the same recursion
    (the IDENT edge's transpose is the identity), removing all special
    cases.  Tape length drops from ops+edges to 2*ops.
  - **G-way tree interleaving.** Each kernel instance carries G trees with
    *separate scratch buffers*; their op streams interleave
    instruction-by-instruction, so G independent dependency chains hide
    each other's latency (separate memrefs keep Mosaic's dependence
    analysis from serializing them).
  - **hi/lo split buffers.** Partials are stored as two bf16 planes
    (hi = round-to-nearest top 16 bits, lo = remainder; same bytes as
    f32).  The 3-pass bf16 dots stream the planes directly.
  - **K-stacked fused operands (round 4).** The whole 3-pass evolve is
    ONE MXU dot ([Lhi|Llo|Lhi] against [bh;bh;bl], assemble_fwd_L); the
    outside op computes evolve + derivative evolve in the same single
    dot (assemble_fwd_LD, with dP = rate*clock*Q*P built by one einsum)
    and its transpose passes in one row-stacked dot_general
    (assemble_up_L).  All operands are gathered and assembled by XLA
    outside the kernel.
  - **VPU row reductions.** Root site likelihoods and the gradient
    numerator/denominator contractions are f32 cross-sublane sums instead
    of MXU dots.
  - **Periodic rescaling.** Ops run in groups of RESK=4 with one rescale
    per group (the economics of BEAGLE's periodic scaling, reference
    src/engine.cpp SetRescaling); per-site log scales stay exact because
    child scale rows are combined on every op.

Reference parity: this computes the same quantities as
beagleUpdatePartials/beagleCalculateEdgeDerivatives
(reference src/fat_beagle.cpp:49-169); parity vs the f32 scan tape is
asserted by tests and pinned at 5e-5 by the bench guard (measured
6e-6 on v5e, BENCH_r04).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESK = 4  # ops per rescale group
BUF_DTYPE = jnp.bfloat16  # debug: jnp.float32 isolates hi/lo storage error

# Mosaic's default scoped-VMEM limit is 16 MB, far below the physical VMEM
# of a v5e core; raising it admits wider tree interleaves (G>2) at full
# pattern tiles, which is pure latency hiding for this latency-bound
# kernel.  Overridable for experiments via BITO_PALLAS_VMEM_MB.
import os as _os

_VMEM_LIMIT = int(_os.environ.get("BITO_PALLAS_VMEM_MB", "96")) * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class PairedEncoding:
    """Host-side paired-slot tapes derived from a TreeBatchEncoding."""

    num_taxa: int
    num_slots: int          # old per-node slot count (grad row space)
    M: int                  # padded postorder op count (multiple of RESK)
    n_pair_slots: int       # 2*M + 3 (root, trash, ones-dummy)
    post_dst: np.ndarray    # [B, M] destination pair-slot per op
    post_e: np.ndarray      # [B, M, 2] edge indices (into P_blk) per child
    post_src: np.ndarray    # [B, M, 2] source node ids (gradient rows)
    tip_slot: np.ndarray    # [B, T] pair-slot of each tip's partial

    @property
    def root_slot(self) -> int:
        return 2 * self.M

    @property
    def trash_slot(self) -> int:
        return 2 * self.M + 1

    @property
    def ones_slot(self) -> int:
        return 2 * self.M + 2


def build_paired_encoding(enc) -> PairedEncoding:
    """Derive paired-slot tapes from a TreeBatchEncoding (pure host work,
    cached by the engine per encoding)."""
    B, M0, _ = enc.post_ops.shape
    T = enc.num_taxa
    DUMMY = enc.num_slots

    M = _rup(max(M0, 1), RESK)
    TRASH = 2 * M + 1
    ONES = 2 * M + 2
    ROOT = 2 * M
    GTRASH = enc.num_slots  # trash gradient row

    post_dst = np.full((B, M), TRASH, dtype=np.int32)
    post_e = np.full((B, M, 2), DUMMY, dtype=np.int32)  # DUMMY == identity
    post_src = np.full((B, M, 2), GTRASH, dtype=np.int32)
    tip_slot = np.full((B, T), TRASH, dtype=np.int32)

    for b in range(B):
        producer: dict = {}
        for m in range(M0):
            u, s1, e1, s2, e2 = (int(x) for x in enc.post_ops[b, m])
            if u == DUMMY:
                break
            for j, (s, e) in enumerate(((s1, e1), (s2, e2))):
                post_e[b, m, j] = e
                if s == DUMMY:
                    continue
                post_src[b, m, j] = s
                slot = 2 * m + j
                if s in producer:
                    post_dst[b, producer[s]] = slot
                else:
                    assert s < T, (b, m, s)
                    tip_slot[b, s] = slot
            producer[u] = m
        root = int(enc.root[b])
        assert root in producer, (b, root)
        post_dst[b, producer[root]] = ROOT

    return PairedEncoding(
        num_taxa=T, num_slots=enc.num_slots, M=M,
        n_pair_slots=2 * M + 3, post_dst=post_dst, post_e=post_e,
        post_src=post_src, tip_slot=tip_slot,
    )


# ---------------------------------------------------------------------------
# XLA-side operand assembly (traced; fuses into the caller's jit)
# ---------------------------------------------------------------------------

def _mask_split(x):
    """f32 -> (hi, lo) f32 pair via integer bit arithmetic: hi keeps the
    top 16 bits rounded to nearest-even (exactly bf16-representable),
    lo = x - hi.  astype(bf16) round-trips cannot be used for the split:
    XLA's simplifier folds convert(convert(x, bf16), f32) to x under jit
    (and interpret-mode Pallas treats the cast as a value no-op), silently
    zeroing the lo plane.  This is THE split helper — kernel-safe (pure
    integer ops, traceable inside Pallas bodies); pallas_chunked imports
    it rather than keeping a copy that could drift."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    # Round-to-nearest-even on the top 16 bits (NOT truncation): with
    # truncation |lo| <= 2^-7 |x| and the dropped lo*lo dot term costs
    # ~2^-14 relative -- the round-3 parity regression.  Rounding keeps
    # |lo| <= 2^-9 |x|, so the dropped term is ~2^-18.  Pure integer
    # arithmetic, so neither XLA nor interpret mode can fold it.
    r = (u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))) \
        & jnp.uint32(0xFFFF0000)
    hi = jax.lax.bitcast_convert_type(r, jnp.float32)
    return hi, x - hi


def _hi(x):
    return _mask_split(x)[0].astype(jnp.bfloat16)


def _lo(x):
    return _mask_split(x)[1].astype(jnp.bfloat16)


def _gather_P(P_blk, idx):
    """P_blk [B, N+1, CA, CA], idx [B, M] -> [B, M, CA, CA]."""
    return jnp.take_along_axis(
        P_blk, idx[:, :, None, None].astype(jnp.int32), axis=1)


def _blockdiag2(a, b):
    """[..., CA, CA] x2 -> [..., 2CA, 2CA]."""
    z = jnp.zeros_like(a)
    top = jnp.concatenate([a, z], axis=-1)
    bot = jnp.concatenate([z, b], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _assemble_pair(g1, g2):
    """[B, M, 4CA, 2CA] bf16: rows [hi(blockdiag); lo(blockdiag)]."""
    Lhi = _blockdiag2(_hi(g1), _hi(g2))
    Llo = _blockdiag2(_lo(g1), _lo(g2))
    return jnp.concatenate([Lhi, Llo], axis=-2)


def assemble_post_L(P_blk, post_e):
    return _assemble_pair(_gather_P(P_blk, post_e[:, :, 0]),
                          _gather_P(P_blk, post_e[:, :, 1]))


def assemble_dP_L(dP_blk, post_e):
    return _assemble_pair(_gather_P(dP_blk, post_e[:, :, 0]),
                          _gather_P(dP_blk, post_e[:, :, 1]))


def _bd_hi_lo(P_blk, post_e):
    """Gather the op pair and return (hi, lo) f32 block diagonals
    [B, M, 2CA, 2CA]."""
    bd = _blockdiag2(_gather_P(P_blk, post_e[:, :, 0]),
                     _gather_P(P_blk, post_e[:, :, 1]))
    return _mask_split(bd)


def assemble_fwd_L(P_blk, post_e):
    """K-stacked three-pass forward operand [B, M, 2CA, 6CA] bf16:
    [Lhi | Llo | Lhi] against rights [bh; bh; bl] computes
    Lhi@bh + Llo@bh + Lhi@bl — the whole three-pass bf16 evolve as ONE
    MXU dot (the dot count per op, not arithmetic, is the kernel's
    measured issue cost)."""
    hi, lo = _bd_hi_lo(P_blk, post_e)
    return jnp.concatenate([hi, lo, hi], axis=-1).astype(jnp.bfloat16)


def assemble_fwd_LD(P_blk, dP_blk, post_e, full_lo: bool = False):
    """[B, M, 4CA, 6CA] bf16: rows [L K-stack; D K-stack], so ONE dot per
    outside op yields both the evolve and the derivative evolve
    ([ev; dPp] = Lfwd @ [bh; bh; bl]).

    full_lo: append a 4th column group [0; dlo] contracted against a 4th
    right group bl, restoring the lo*lo term of the DERIVATIVE evolve
    (exact-f32-product 4-pass).  The 3-pass split drops terms ~2^-18
    relative to sum|dP||p| — harmless for the positive evolve, but the
    signed dP@p contraction cancels at large state counts and the
    dropped term amplifies (measured 7e-3 max grad error at codon CA=64
    vs 6e-6 at CA=16); the 4th pass buys back exact products for one
    extra third of MXU work in a latency-bound kernel."""
    hi, lo = _bd_hi_lo(P_blk, post_e)
    dhi, dlo = _bd_hi_lo(dP_blk, post_e)
    if full_lo:
        z = jnp.zeros_like(hi)
        top = jnp.concatenate([hi, lo, hi, z], axis=-1)
        bot = jnp.concatenate([dhi, dlo, dhi, dlo], axis=-1)
    else:
        top = jnp.concatenate([hi, lo, hi], axis=-1)
        bot = jnp.concatenate([dhi, dlo, dhi], axis=-1)
    return jnp.concatenate([top, bot], axis=-2).astype(jnp.bfloat16)


def assemble_up_L(P_blk, post_e):
    """Row-stacked transpose operand [B, M, 6CA, 2CA] bf16:
    [Lhi; Llo; Lhi] contracted on rows against [oh; oh; ol] computes
    Lhi^T@oh + Llo^T@oh + Lhi^T@ol — the outside pass's up pair as ONE
    dot_general."""
    hi, lo = _bd_hi_lo(P_blk, post_e)
    return jnp.concatenate([hi, lo, hi], axis=-2).astype(jnp.bfloat16)


def assemble_Q_pair(eig, category_rates, clock_rate):
    """[B, 4CA, 2CA] bf16 hi/lo-stacked blockdiag2(Qcat, Qcat), where
    Qcat = blockdiag_c(rate_c * clock * Q) and Q = U diag(lam) U^-1.

    dP(bl)/dbl = rate*clock * Q @ P(bl), so the outside pass computes the
    derivative evolve as ONE per-tree constant operand against the values
    it already evolved — the per-edge dP gather/assembly and its VMEM
    stream (half the kernel's streamed operand bytes, and ~half the XLA
    prep) disappear entirely."""
    B, C = category_rates.shape
    A = eig.U.shape[-1]
    Q = jnp.einsum("bij,bj,bjk->bik", eig.U, eig.values, eig.U_inv)
    QC = jnp.einsum("bc,bik->bcik",
                    category_rates * clock_rate[:, None], Q)  # [B,C,A,A]
    eye = jnp.eye(C, dtype=Q.dtype)
    Qcat = jnp.einsum("bcik,cd->bcidk", QC, eye).reshape(B, C * A, C * A)
    Qcat = Qcat.astype(jnp.float32)  # the hi/lo split bitcasts f32
    return _assemble_pair(Qcat[:, None], Qcat[:, None])[:, 0]


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


# In-kernel alias for the same split (historical name; one implementation).
_trunc_split = _mask_split


def _split_store(ref_h, ref_l, start, x):
    hi, lo = _trunc_split(x)
    ref_h[pl.ds(start, x.shape[0]), :] = hi.astype(ref_h.dtype)
    ref_l[pl.ds(start, x.shape[0]), :] = lo.astype(ref_l.dtype)


def _pair_rights(bufh, bufl, m, CA, groups: int = 3):
    """[bh; bh; bl] rights [6CA, S] for the K-stacked forward dot
    (groups=4 appends a second bl group for the full_lo operand)."""
    bh = bufh[pl.ds(2 * m * CA, 2 * CA), :]
    bl = bufl[pl.ds(2 * m * CA, 2 * CA), :]
    if groups == 4:
        return jnp.concatenate([bh, bh, bl, bl], axis=0)
    return jnp.concatenate([bh, bh, bl], axis=0)


def _pair_evolve(Lref, idx, bufh, bufl, m, CA):
    """[ev1; ev2] for op m: the whole 3-pass block-diagonal evolve as ONE
    K-stacked dot (see assemble_fwd_L).  Returns [2CA, S] f32.  Works on
    both the LL operand ([2CA, 6CA]) and the grad operand ([4CA, 6CA],
    whose derivative rows the post pass does not need)."""
    Lst = Lref[0, idx]
    groups = Lst.shape[-1] // (2 * CA)
    return _dot(Lst[0:2 * CA], _pair_rights(bufh, bufl, m, CA, groups))


def _post_op(pdst_ref, Lpost_ref, bufh, bufl, ls, g, m, M, CA, rescale):
    ev = _pair_evolve(Lpost_ref, g * M + m, bufh, bufl, m, CA)
    prod = ev[0:CA] * ev[CA:2 * CA]               # [CA, S]
    # Two 1-row loads: a 2-row vector load at a non-multiple-of-8 sublane
    # offset is rejected by Mosaic.
    new_ls = ls[pl.ds(2 * m, 1), :] + ls[pl.ds(2 * m + 1, 1), :]
    if rescale:
        mx = jnp.max(prod, axis=0, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        prod = prod / mx
        new_ls = new_ls + jnp.log(mx)
    dst = pdst_ref[0, 0, g * M + m]
    _split_store(bufh, bufl, dst * CA, prod)
    ls[pl.ds(dst, 1), :] = new_ls


def _pre_op(pdst_ref, psrc_ref, Lfwd_ref, Lup_ref,
            grad_ref, bufh, bufl, w, propcol2,
            g, m, M, CA, NPg, rescale):
    """Outside pass for op m: both siblings' gradient rows + up pair.

    The outside ("up") values live IN the partials buffer: op m is the last
    reader of its pair rows' partials, so the up pair overwrites rows 2m in
    place.  The op's own outside value was likewise written into rows
    dst(m) by its consumer (which, in reverse tape order, ran earlier).
    (A separate f32 outside buffer and MXU selector-dot reductions were
    both measured slightly SLOWER on v5e — the kernel is pinned at
    ~0.35 us per sequenced op regardless of its arithmetic; see
    IMPLEMENTATION_NOTES round 4.)"""
    idx = g * M + m
    # ONE K-stacked dot produces the evolve AND the derivative evolve
    # (assemble_fwd_LD): the kernel's issue cost is its dot count.
    Lst = Lfwd_ref[0, idx]
    fwd = _dot(Lst, _pair_rights(bufh, bufl, m, CA,
                                 Lst.shape[-1] // (2 * CA)))
    ev = fwd[0:2 * CA]
    dPp = fwd[2 * CA:4 * CA]
    dst = pdst_ref[0, 0, idx]
    up_m = (bufh[pl.ds(dst * CA, CA), :].astype(jnp.float32)
            + bufl[pl.ds(dst * CA, CA), :].astype(jnp.float32))
    evsw = jnp.concatenate([ev[CA:2 * CA], ev[0:CA]], axis=0)
    o = jnp.concatenate([up_m, up_m], axis=0) * evsw
    if rescale:
        mx = jnp.max(o, axis=0, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        o = o / mx
    po = propcol2 * o                             # [2CA, S]
    poe = po * ev
    pod = po * dPp
    den1 = jnp.sum(poe[0:CA], axis=0, keepdims=True)
    den2 = jnp.sum(poe[CA:2 * CA], axis=0, keepdims=True)
    num1 = jnp.sum(pod[0:CA], axis=0, keepdims=True)
    num2 = jnp.sum(pod[CA:2 * CA], axis=0, keepdims=True)
    den1 = jnp.where(den1 > 0, den1, 1.0)
    den2 = jnp.where(den2 > 0, den2, 1.0)
    grad_ref[0, pl.ds(g * NPg + psrc_ref[0, idx, 0], 1), :] = w * num1 / den1
    grad_ref[0, pl.ds(g * NPg + psrc_ref[0, idx, 1], 1), :] = w * num2 / den2
    # up pair: blockdiag(P1^T, P2^T) @ o, overwriting the now-dead pair
    # partials where each source's own op will read its outside value.
    # One row-stacked dot_general (assemble_up_L) contracts [Lhi; Llo;
    # Lhi] against [oh; oh; ol] — all three transpose passes in ONE MXU
    # instruction (blockdiag(A,B)^T = blockdiag(A^T,B^T), and the hi/lo
    # split commutes with transpose).
    ohf, olf = _trunc_split(o)
    oh = ohf.astype(jnp.bfloat16)
    ro = jnp.concatenate([oh, oh, olf.astype(jnp.bfloat16)], axis=0)
    upv = jax.lax.dot_general(
        Lup_ref[0, idx], ro, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    _split_store(bufh, bufl, 2 * m * CA, upv)


def _init_tips(bufh, bufl, ls, tip_ref, tipsb_ref, g, T, CA):
    bufh[...] = jnp.ones_like(bufh)
    bufl[...] = jnp.zeros_like(bufl)
    ls[...] = jnp.zeros_like(ls)

    def tip_body(t, _):
        slot = tip_ref[0, 0, g * T + t]
        bufh[pl.ds(slot * CA, CA), :] = tipsb_ref[pl.ds(t * CA, CA), :]
        return 0

    jax.lax.fori_loop(0, T, tip_body, 0)


def _root_ll(bufh, bufl, ls, pip_col, ROOT, CA):
    rootp = (bufh[pl.ds(ROOT * CA, CA), :].astype(jnp.float32)
             + bufl[pl.ds(ROOT * CA, CA), :].astype(jnp.float32))
    site = jnp.sum(pip_col * rootp, axis=0, keepdims=True)   # [1, S]
    return jnp.log(site) + ls[pl.ds(ROOT, 1), :]


def _ll_kernel(pdst_ref, tip_ref, Lpost_ref, tipsb_ref, piprop_ref,
               ll_ref, *scratch, M, T, CA, G):
    ROOT = 2 * M
    pip_col = piprop_ref[...].reshape(CA, 1)
    for g in range(G):
        bufh, bufl, ls = scratch[3 * g:3 * g + 3]
        _init_tips(bufh, bufl, ls, tip_ref, tipsb_ref, g, T, CA)

    def group(k, _):
        for i in range(RESK):
            for g in range(G):
                bufh, bufl, ls = scratch[3 * g:3 * g + 3]
                _post_op(pdst_ref, Lpost_ref, bufh, bufl, ls, g,
                         k * RESK + i, M, CA, i == RESK - 1)
        return 0

    jax.lax.fori_loop(0, M // RESK, group, 0)
    for g in range(G):
        bufh, bufl, ls = scratch[3 * g:3 * g + 3]
        ll_ref[0, pl.ds(g, 1), :] = _root_ll(bufh, bufl, ls, pip_col,
                                             ROOT, CA)


def _grad_kernel(pdst_ref, tip_ref, psrc_ref,
                 Lfwd_ref, Lup_ref,
                 tipsb_ref, pivec_ref, propvec_ref, w_ref,
                 ll_ref, grad_ref, *scratch, M, T, CA, NPg, G):
    ROOT = 2 * M
    pivec_col = pivec_ref[...].reshape(CA, 1)
    propcol = propvec_ref[...].reshape(CA, 1)
    propcol2 = jnp.concatenate([propcol, propcol], axis=0)
    pip_col = pivec_col * propcol
    w = w_ref[...]                                # [1, S]

    for g in range(G):
        bufh, bufl, ls = scratch[3 * g:3 * g + 3]
        _init_tips(bufh, bufl, ls, tip_ref, tipsb_ref, g, T, CA)

    def group(k, _):
        for i in range(RESK):
            for g in range(G):
                bufh, bufl, ls = scratch[3 * g:3 * g + 3]
                _post_op(pdst_ref, Lfwd_ref, bufh, bufl, ls, g,
                         k * RESK + i, M, CA, i == RESK - 1)
        return 0

    jax.lax.fori_loop(0, M // RESK, group, 0)

    grad_ref[...] = jnp.zeros_like(grad_ref)
    for g in range(G):
        bufh, bufl, ls = scratch[3 * g:3 * g + 3]
        ll_ref[0, pl.ds(g, 1), :] = _root_ll(bufh, bufl, ls, pip_col,
                                             ROOT, CA)
        # Seed the outside recursion: the root's "up" is pi, written over
        # the root partial (already consumed by the LL above).
        _split_store(bufh, bufl, ROOT * CA, jnp.broadcast_to(
            pivec_col, (CA, bufh.shape[1])))

    # Outside pass in reverse tape order: consumers run before producers,
    # so the outside value at dst(m) is always written before op m reads it.
    def pre_group(q, _):
        k = M // RESK - 1 - q
        for i in range(RESK - 1, -1, -1):
            for g in range(G):
                bufh, bufl, ls = scratch[3 * g:3 * g + 3]
                _pre_op(pdst_ref, psrc_ref, Lfwd_ref, Lup_ref,
                        grad_ref, bufh, bufl, w, propcol2,
                        g, k * RESK + i, M, CA, NPg, i == 0)
        return 0

    jax.lax.fori_loop(0, M // RESK, pre_group, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _tips_bf16(tips_flat):
    return tips_flat.astype(BUF_DTYPE)


def _pick_group(B: int, group) -> int:
    if group is not None:
        return group if B % group == 0 else 1
    for g in (4, 2):
        if B % g == 0:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=(
    "M", "T", "CA", "n_pair_slots", "s_tile", "group", "interpret"))
def paired_log_likelihoods(
    post_dst, tip_slot, P_blk, post_e, tips_flat, piprop, weights,
    *, M, T, CA, n_pair_slots, s_tile, group=None, interpret=False,
):
    """Per-tree log likelihoods via the paired-slot kernel.

    post_dst [B, M], tip_slot [B, T], P_blk [B, N+1, CA, CA] f32,
    post_e [B, M, 2], tips_flat [T*CA, S] f32, piprop [1, CA], weights [S].
    """
    B = post_dst.shape[0]
    S = tips_flat.shape[1]
    assert S % s_tile == 0, (S, s_tile)
    G = _pick_group(B, group)
    NS = n_pair_slots
    Lpost = assemble_fwd_L(P_blk, post_e)
    tipsb = _tips_bf16(tips_flat)
    grid = (B // G, S // s_tile)

    out = pl.pallas_call(
        functools.partial(_ll_kernel, M=M, T=T, CA=CA, G=G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G * M), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G * T), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G * M, 2 * CA, 6 * CA),
                         lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T * CA, s_tile), lambda b, s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CA), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, s_tile), lambda b, s: (b, 0, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // G, G, S), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NS * CA, s_tile), BUF_DTYPE) if i % 3 != 2 else
            pltpu.VMEM((NS, s_tile), jnp.float32)
            for i in range(3 * G)
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(post_dst.reshape(B // G, 1, G * M),
      tip_slot.reshape(B // G, 1, G * T),
      Lpost.reshape(B // G, G * M, 2 * CA, 6 * CA), tipsb, piprop)
    return out.reshape(B, S) @ weights


def paired_log_likelihoods_sharded(
    mesh, axis, post_dst, tip_slot, P_blk, post_e, tips_flat, piprop,
    weights, *, M, T, CA, n_pair_slots, group=None, interpret=False,
):
    """Pattern-sharded LL-only kernel: per-shard paired kernel under
    shard_map, one psum for the per-tree totals."""
    from jax.sharding import PartitionSpec as PS

    n_dev = mesh.shape[axis]
    S = tips_flat.shape[1]
    assert S % n_dev == 0, (S, n_dev)
    s_local = S // n_dev
    s_tile = s_local
    if s_local > 1024:
        # Prefer a VMEM-safe divisor tile; a shard size with no such
        # divisor (e.g. 1040) falls back to one whole-shard tile rather
        # than raising on the empty max().
        for t in (1024, 512, 256, 128):
            if s_local % t == 0:
                s_tile = t
                break

    def local_fn(tips_l, w_l, post_dst, tip_slot, P_blk, post_e, piprop):
        ll = paired_log_likelihoods(
            post_dst, tip_slot, P_blk, post_e, tips_l, piprop, w_l,
            M=M, T=T, CA=CA, n_pair_slots=n_pair_slots, s_tile=s_tile,
            group=group, interpret=interpret)
        return jax.lax.psum(ll, axis)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(PS(None, axis), PS(axis), PS(), PS(), PS(), PS(), PS()),
        out_specs=PS(),
        check_vma=False,
    )
    return fn(tips_flat, weights, post_dst, tip_slot, P_blk, post_e,
              piprop)


def _paired_grad_rows(
    post_dst, tip_slot, post_src, post_e,
    P_blk, dP_blk, tips_flat, pivec, propvec, weights,
    *, M, T, CA, n_pair_slots, num_slots, s_tile, group=None,
    interpret=False,
):
    """Kernel dispatch returning per-pattern rows: (ll_rows [B, S],
    weighted gradient rows [B, NPg, S]).  The reductions over patterns
    happen in the caller — locally for a single device, behind a psum for
    the pattern-sharded path."""
    B = post_dst.shape[0]
    S = tips_flat.shape[1]
    assert S % s_tile == 0, (S, s_tile)
    G = _pick_group(B, group)
    NS = n_pair_slots
    NPg = _rup(num_slots + 1, 8)
    # Large state spaces (codon CA=64) need the 4th (lo*lo) derivative
    # pass: the signed dP@p contraction cancels and amplifies the 3-pass
    # truncation ~1000x (7e-3 measured).  CA=16 keeps the measured-fast
    # 3-pass (6e-6 parity, BENCH_r04).
    Lfwd = assemble_fwd_LD(P_blk, dP_blk, post_e, full_lo=(CA > 16))
    Lup = assemble_up_L(P_blk, post_e)
    tipsb = _tips_bf16(tips_flat)
    w2 = weights.reshape(1, S)
    grid = (B // G, S // s_tile)

    ll, wgrad = pl.pallas_call(
        functools.partial(_grad_kernel, M=M, T=T, CA=CA, NPg=NPg, G=G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G * M), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G * T), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G * M, 2), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G * M, 4 * CA, Lfwd.shape[-1]),
                         lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * M, 6 * CA, 2 * CA),
                         lambda b, s: (b, 0, 0, 0),
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
            pl.BlockSpec((1, G, s_tile), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * NPg, s_tile), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B // G, G, S), jnp.float32),
            jax.ShapeDtypeStruct((B // G, G * NPg, S), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NS * CA, s_tile), BUF_DTYPE) if i % 3 != 2 else
            pltpu.VMEM((NS, s_tile), jnp.float32)
            for i in range(3 * G)
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(post_dst.reshape(B // G, 1, G * M),
      tip_slot.reshape(B // G, 1, G * T),
      post_src.reshape(B // G, G * M, 2),
      Lfwd.reshape(B // G, G * M, 4 * CA, Lfwd.shape[-1]),
      Lup.reshape(B // G, G * M, 6 * CA, 2 * CA),
      tipsb, pivec, propvec, w2)
    return ll.reshape(B, S), wgrad.reshape(B, NPg, S)


@functools.partial(jax.jit, static_argnames=(
    "M", "T", "CA", "n_pair_slots", "num_slots", "s_tile", "group",
    "interpret"))
def paired_ll_and_gradients(
    post_dst, tip_slot, post_src, post_e, edge_mask,
    P_blk, dP_blk, tips_flat, pivec, propvec, weights,
    *, M, T, CA, n_pair_slots, num_slots, s_tile, group=None,
    interpret=False,
):
    """Per-tree (log likelihood [B], branch gradients [B, num_slots])."""
    ll_rows, wgrad = _paired_grad_rows(
        post_dst, tip_slot, post_src, post_e, P_blk, dP_blk, tips_flat,
        pivec, propvec, weights, M=M, T=T, CA=CA,
        n_pair_slots=n_pair_slots, num_slots=num_slots, s_tile=s_tile,
        group=group, interpret=interpret)
    ll_total = ll_rows @ weights
    grads = wgrad.sum(axis=2)[:, :num_slots] * edge_mask
    return ll_total, grads


def paired_ll_and_gradients_sharded(
    mesh, axis, post_dst, tip_slot, post_src, post_e, edge_mask,
    P_blk, dP_blk, tips_flat, pivec, propvec, weights,
    *, M, T, CA, n_pair_slots, num_slots, group=None, interpret=False,
):
    """Pattern-sharded paired kernel (SURVEY P2+P5 composed): each device
    runs the SAME VMEM-resident kernel on its local pattern shard under
    shard_map, and the per-tree reductions ride one psum over the mesh —
    the flagship kernel and the flagship parallelism mechanism no longer
    exclude each other (the reference's SIMD kernels likewise run under
    its threading, src/engine.cpp:17-19)."""
    from jax.sharding import PartitionSpec as PS

    n_dev = mesh.shape[axis]
    S = tips_flat.shape[1]
    assert S % n_dev == 0, (S, n_dev)
    s_local = S // n_dev
    s_tile = s_local
    if s_local > 1024:
        # Prefer a VMEM-safe divisor tile; a shard size with no such
        # divisor (e.g. 1040) falls back to one whole-shard tile rather
        # than raising on the empty max().
        for t in (1024, 512, 256, 128):
            if s_local % t == 0:
                s_tile = t
                break

    def local_fn(tips_l, w_l, post_dst, tip_slot, post_src, post_e,
                 edge_mask, P_blk, dP_blk, pivec, propvec):
        ll_rows, wgrad = _paired_grad_rows(
            post_dst, tip_slot, post_src, post_e, P_blk, dP_blk, tips_l,
            pivec, propvec, w_l, M=M, T=T, CA=CA,
            n_pair_slots=n_pair_slots, num_slots=num_slots,
            s_tile=s_tile, group=group, interpret=interpret)
        ll = jax.lax.psum(ll_rows @ w_l, axis)
        grads = jax.lax.psum(wgrad.sum(axis=2), axis)
        return ll, grads[:, :num_slots] * edge_mask

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(PS(None, axis), PS(axis), PS(), PS(), PS(), PS(),
                  PS(), PS(), PS(), PS(), PS()),
        out_specs=(PS(), PS()),
        # pallas_call outputs carry no varying-mesh-axes metadata; the
        # explicit psums above establish the replication.
        check_vma=False,
    )
    return fn(tips_flat, weights, post_dst, tip_slot, post_src, post_e,
              edge_mask, P_blk, dP_blk, pivec, propvec)
