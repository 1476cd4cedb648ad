"""Level-synchronous chunked Pallas TPU kernel for Felsenstein pruning (v4).

The round-3 paired kernel (pallas_paired.py) reduced the tape to one
block-diagonal dot per postorder op, but remained latency-bound at
~0.35 us/op on the serialized store->load chain through the dynamically
indexed VMEM partials buffer: DS1's 28-op postorder chain costs 28 latency
turnarounds no matter how little arithmetic each op does.  This kernel
attacks the chain *length*: W mutually independent ops (a level-synchronous
chunk) execute as ONE wider block-diagonal dot, so the chain shrinks from
M ops to ceil-ish(M/W) chunks (bounded below by tree depth).  DS1's 26-28 ops
pack into 13-16 chunks at W=4 (the trees are deeper than the round-3
estimate; see the round-4 notes for why this kernel measured SLOWER than
the paired design and is therefore an opt-in).

Design (vs pallas_paired):
  - **Chunked pair-slot layout.**  Ops are greedily list-scheduled (height
    priority) into fixed-width chunks of W; op at grid position g owns pair
    slots 2g, 2g+1, so chunk c's 2W child partials occupy ONE contiguous
    [2W*CA, S] row range - one load feeds one [4W*CA, 2W*CA] x [2W*CA, S]
    three-pass bf16 dot.  W=4 at CA=16 makes the contraction exactly one
    128-wide MXU tile, so the wider dot costs the same latency as the old
    per-op [4CA, 2CA] dot.
  - **f32 single-plane partials.**  The paired kernel stored two bf16
    hi/lo planes; same bytes as one f32 plane but twice the stores, and a
    ~2^-16 round on every stored value (the round-3 parity regression to
    4.8e-5).  Partials are stored once in f32 and split into bf16 hi/lo in
    registers at load time (round-to-nearest bit arithmetic - see
    _mask_split for why astype(bf16) round-trips cannot implement the
    split).
  - **XLA-side block-diagonal assembly** (pack_expanded_operands).  An
    in-kernel lane-mask expansion of compact operands was measured ~2.5x
    SLOWER (Mosaic lowers the sublane concats to relayouts), so the
    materialized block diagonals stream from HBM despite being ~2W x
    zeros.
  - **Contiguous gradient-row stores.**  Gradient rows are indexed by grid
    position (2g+j), not node id, so each pre chunk stores one [2W, S]
    block; XLA permutes rows back to node order outside the kernel.
  - **Paired outside pass, chunked.**  As in pallas_paired, one outside op
    per postorder op produces both siblings' gradient rows and the up pair,
    in reverse chunk order; each pre chunk's up values overwrite the
    chunk's own (dead) pair rows in ONE contiguous [2W*CA, S] store.
  - **Per-chunk rescaling** (the reference's periodic scaling economics,
    src/fat_beagle.cpp SetRescaling): every op rescales once per chunk;
    per-site log scales stay exact via the ls accumulator rows.

Reference parity: computes the same quantities as beagleUpdatePartials /
beagleCalculateEdgeDerivatives (reference src/fat_beagle.cpp:49-169);
parity vs the f32 scan tape is asserted by tests/test_pallas_chunked.py
and the bench guard.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class ChunkedEncoding:
    """Host-side chunked-schedule tapes derived from a TreeBatchEncoding."""

    num_taxa: int
    num_slots: int          # original per-node slot count
    W: int                  # chunk width (ops per chunk)
    Mc: int                 # number of chunks (max over trees)
    post_dst: np.ndarray    # [B, Mc*W] destination pair-slot per grid op
    post_e: np.ndarray      # [B, Mc*W, 2] edge indices per child
    tip_slot: np.ndarray    # [B, T] pair-slot of each tip's partial
    node_row: np.ndarray    # [B, num_slots] node id -> gradient grid row
    #   (2g+j of the op that consumes the node with its real edge;
    #    2*Mc*W, a padded zero row, for nodes with no real edge)

    @property
    def MW(self) -> int:
        return self.Mc * self.W

    @property
    def root_slot(self) -> int:
        return 2 * self.MW

    @property
    def trash_slot(self) -> int:
        return 2 * self.MW + 1

    @property
    def n_pair_slots(self) -> int:
        return 2 * self.MW + 2


def _schedule_tree(ops, T: int, DUMMY: int, W: int):
    """Greedy height-priority list scheduling of one tree's postorder ops
    into independence chunks of width <= W.

    ops: list of (u, s1, e1, s2, e2).  Returns a list of chunks, each a
    list of op indices, such that no op's source is produced by an op in
    the same chunk."""
    n = len(ops)
    producer = {}
    deps = []
    for m, (u, s1, e1, s2, e2) in enumerate(ops):
        d = []
        for s in (s1, s2):
            if s in producer:
                # internal node or accumulator value produced by an op
                d.append(producer[s])
            else:
                assert s == DUMMY or s < T, (m, s)
        deps.append(d)
        producer[u] = m
    # height = longest path to the final op (critical-path priority)
    consumers = [[] for _ in range(n)]
    for m, d in enumerate(deps):
        for p in d:
            consumers[p].append(m)
    height = [0] * n
    for m in range(n - 1, -1, -1):
        for c in consumers[m]:
            height[m] = max(height[m], height[c] + 1)
    done = [False] * n
    chunks = []
    remaining = n
    while remaining:
        # done[] reflects only previous chunks here, so intra-chunk
        # dependencies can never be selected.
        ready = [m for m in range(n)
                 if not done[m] and all(done[p] for p in deps[m])]
        ready.sort(key=lambda m: (-height[m], m))
        take = ready[:W]
        assert take, "scheduler stall (cyclic tape?)"
        for m in take:
            done[m] = True
        remaining -= len(take)
        chunks.append(take)
    return chunks


def build_chunked_encoding(enc, W: int = 4) -> ChunkedEncoding:
    """Derive chunked-schedule tapes from a TreeBatchEncoding (pure host
    work, cached by the engine per encoding)."""
    B, M0, _ = enc.post_ops.shape
    T = enc.num_taxa
    DUMMY = enc.num_slots

    per_tree = []
    Mc = 1
    for b in range(B):
        ops = []
        for m in range(M0):
            row = tuple(int(x) for x in enc.post_ops[b, m])
            if row[0] == DUMMY:
                break
            ops.append(row)
        chunks = _schedule_tree(ops, T, DUMMY, W)
        per_tree.append((ops, chunks))
        Mc = max(Mc, len(chunks))

    MW = Mc * W
    TRASH = 2 * MW + 1
    ROOT = 2 * MW
    GTRASH = 2 * MW  # padded zero gradient row

    post_dst = np.full((B, MW), TRASH, dtype=np.int32)
    post_e = np.full((B, MW, 2), DUMMY, dtype=np.int32)
    tip_slot = np.full((B, T), TRASH, dtype=np.int32)
    node_row = np.full((B, enc.num_slots), GTRASH, dtype=np.int32)

    for b, (ops, chunks) in enumerate(per_tree):
        # op index -> grid position
        grid_of = {}
        for c, chunk in enumerate(chunks):
            for i, m in enumerate(chunk):
                grid_of[m] = c * W + i
        producer = {}
        for c, chunk in enumerate(chunks):
            for i, m in enumerate(chunk):
                g = c * W + i
                u, s1, e1, s2, e2 = ops[m]
                for j, (s, e) in enumerate(((s1, e1), (s2, e2))):
                    post_e[b, g, j] = e
                    if s == DUMMY:
                        continue
                    slot = 2 * g + j
                    if s in producer:
                        post_dst[b, producer[s]] = slot
                    else:
                        assert s < T, (b, m, s)
                        tip_slot[b, s] = slot
                    if e != enc.identity_edge:
                        # the op consuming node s with its real edge owns
                        # s's gradient row (each non-root node is consumed
                        # with its real edge exactly once)
                        node_row[b, s] = 2 * g + j
                producer[u] = g
        root = int(enc.root[b])
        assert root in producer, (b, root)
        post_dst[b, producer[root]] = ROOT

    return ChunkedEncoding(
        num_taxa=T, num_slots=enc.num_slots, W=W, Mc=Mc,
        post_dst=post_dst, post_e=post_e, tip_slot=tip_slot,
        node_row=node_row,
    )


# ---------------------------------------------------------------------------
# XLA-side operand packing (traced; fuses into the caller's jit)
# ---------------------------------------------------------------------------

import os as _os

# Mosaic's default scoped-VMEM limit is 16 MB; the physical VMEM of a v5e
# core is far larger.  Raising it admits wider tree interleaves (G>2) at
# full pattern tiles — pure latency hiding for a latency-bound kernel.
_VMEM_LIMIT = int(_os.environ.get("BITO_PALLAS_VMEM_MB", "96")) * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


# Single round-to-nearest hi/lo split shared with the paired kernel
# (advisor round-4 finding: four identical copies could silently drift).
from .pallas_paired import _mask_split, _trunc_split  # noqa: E402


def pack_expanded_operands(P_blk, post_e, W: int):
    """Materialized chunk block diagonals [B, Mc, 4W*CA, 2W*CA] bf16
    (rows: [hi(blockdiag); lo(blockdiag)]).  ~2W x zeros vs the compact
    form, but the kernel then feeds the MXU straight from the streamed
    block with no in-kernel expansion; at DS1 scale the extra HBM traffic
    is ~0.3 ms/batch while in-kernel lane-mask expansion measured ~5x
    kernel slowdown (Mosaic lowers the sublane concats to relayouts)."""
    B, MW, _ = post_e.shape
    Mc = MW // W
    CA = P_blk.shape[-1]
    n = 2 * W * CA
    Pg = jnp.take_along_axis(
        P_blk, post_e.reshape(B, MW * 2)[:, :, None, None].astype(jnp.int32),
        axis=1)                                     # [B, 2*MW, CA, CA]
    Pg = Pg.reshape(B, Mc, 2 * W, CA, CA)
    hi, lo = _mask_split(Pg)
    # block-diagonal placement via one-hot on the block axis
    eye = jnp.eye(2 * W, dtype=P_blk.dtype)         # [2W, 2W]
    def bd(x):
        # [B, Mc, 2W, CA, CA] -> [B, Mc, 2W*CA, 2W*CA]
        y = jnp.einsum("bmoij,op->bmoipj", x, eye)
        return y.reshape(B, Mc, 2 * W * CA, 2 * W * CA)
    return jnp.concatenate([bd(hi), bd(lo)], axis=2).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dotT(a, b):
    """Contract on the row axis (a^T @ b without materializing a^T)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _row_selector(W: int, CA: int):
    """R [2W, 2W*CA] f32 with R[r, r*CA + i] = 1: per-CA-block row sums as
    one small MXU dot (Mosaic reshapes that split the sublane axis retile;
    a selector dot does not)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (2 * W, 2 * W * CA), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (2 * W, 2 * W * CA), 1)
    return (l // CA == r).astype(jnp.float32)


def _chunk_evolve(Lc_ref, idx, buf, c, W, CA, with_d, Ld_ref=None):
    """One chunk's three-pass block-diagonal evolve: returns ev [2W*CA, S]
    (and the derivative evolve when with_d)."""
    base = 2 * W * CA * c
    rows = buf[pl.ds(base, 2 * W * CA), :]
    rh_f, rl_f = _trunc_split(rows)
    rh = rh_f.astype(jnp.bfloat16)
    rl = rl_f.astype(jnp.bfloat16)
    n = 2 * W * CA
    Lst = Lc_ref[0, idx]                        # [4WCA, 2WCA] bf16
    bd_h = Lst[0:n]
    bd_l = Lst[n:2 * n]
    if not with_d:
        big = _dot(Lst, rh)
        ev = big[0:n] + big[n:2 * n] + _dot(bd_h, rl)
        return ev, None, (bd_h, bd_l)
    Ldst = Ld_ref[0, idx]
    big = _dot(jnp.concatenate([Lst, Ldst], axis=0), rh)
    cross = _dot(jnp.concatenate([bd_h, Ldst[0:n]], axis=0), rl)
    ev = big[0:n] + big[n:2 * n] + cross[0:n]
    dPp = big[2 * n:3 * n] + big[3 * n:4 * n] + cross[n:2 * n]
    return ev, dPp, (bd_h, bd_l)


def _chunk_post(pdst_ref, Lc_ref, buf, ls, g, c, Mc, W, CA):
    """Post pass for chunk c: W independent ops in one wide dot."""
    ev, _, _ = _chunk_evolve(Lc_ref, g * Mc + c, buf, c, W, CA,
                             with_d=False)
    MW = Mc * W
    for k in range(W):
        e1 = ev[2 * k * CA:(2 * k + 1) * CA]
        e2 = ev[(2 * k + 1) * CA:(2 * k + 2) * CA]
        prod = e1 * e2                           # [CA, S]
        mx = jnp.max(prod, axis=0, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        prod = prod / mx
        # Single-row dynamic loads: a [2W] block load at offset 2W*c is
        # only sublane-aligned when W % 4 == 0.
        new_ls = (ls[pl.ds(2 * (c * W + k), 1), :]
                  + ls[pl.ds(2 * (c * W + k) + 1, 1), :] + jnp.log(mx))
        dst = pdst_ref[0, 0, g * MW + c * W + k]
        buf[pl.ds(dst * CA, CA), :] = prod
        ls[pl.ds(dst, 1), :] = new_ls


def _chunk_pre(pdst_ref, Lc_ref, Ld_ref, grad_ref, buf, ls, w, propcol2W,
               R, g, c, Mc, W, CA, NPg):
    """Outside pass for chunk c: all W ops' sibling gradients + up pairs.

    The up values live IN the partials buffer (pallas_paired's trick,
    chunked): chunk c's pre is the last reader of its pair rows, so the
    chunk's up pairs overwrite rows [2W*CA*c, 2W*CA*(c+1)) in ONE
    contiguous store; each op's own outside value was written at its dst
    slot by its consumer chunk, which in reverse order ran earlier."""
    ev, dPp, (bd_h, bd_l) = _chunk_evolve(
        Lc_ref, g * Mc + c, buf, c, W, CA, with_d=True, Ld_ref=Ld_ref)
    MW = Mc * W
    o_parts = []
    for k in range(W):
        dst = pdst_ref[0, 0, g * MW + c * W + k]
        up = buf[pl.ds(dst * CA, CA), :]         # [CA, S] f32
        o1 = up * ev[(2 * k + 1) * CA:(2 * k + 2) * CA]
        o2 = up * ev[2 * k * CA:(2 * k + 1) * CA]
        pair = jnp.concatenate([o1, o2], axis=0)
        mx = jnp.max(pair, axis=0, keepdims=True)
        mx = jnp.where(mx > 0, mx, 1.0)
        o_parts.append(pair / mx)
    o = jnp.concatenate(o_parts, axis=0)         # [2WCA, S]
    po = propcol2W * o
    poe = po * ev
    pod = po * dPp
    num = _dot(R, pod)                           # [2W, S]
    den = _dot(R, poe)
    den = jnp.where(den > 0, den, 1.0)
    grad_ref[0, pl.ds(g * NPg + 2 * W * c, 2 * W), :] = w * num / den
    oh_f, ol_f = _trunc_split(o)
    oh = oh_f.astype(jnp.bfloat16)
    ol = ol_f.astype(jnp.bfloat16)
    upv = _dotT(bd_h, oh) + _dotT(bd_l, oh) + _dotT(bd_h, ol)
    buf[pl.ds(2 * W * CA * c, 2 * W * CA), :] = upv


def _init_tips(buf, ls, tip_ref, tipsb_ref, g, T, CA):
    buf[...] = jnp.ones_like(buf)
    ls[...] = jnp.zeros_like(ls)

    def tip_body(t, _):
        slot = tip_ref[0, 0, g * T + t]
        buf[pl.ds(slot * CA, CA), :] = tipsb_ref[
            pl.ds(t * CA, CA), :].astype(buf.dtype)
        return 0

    jax.lax.fori_loop(0, T, tip_body, 0)


def _root_ll(buf, ls, pip_col, ROOT, CA):
    rootp = buf[pl.ds(ROOT * CA, CA), :]
    site = jnp.sum(pip_col * rootp, axis=0, keepdims=True)   # [1, S]
    return jnp.log(site) + ls[pl.ds(ROOT, 1), :]


def _ll_kernel(pdst_ref, tip_ref, Lc_ref, tipsb_ref, piprop_ref,
               ll_ref, *scratch, Mc, W, T, CA, G):
    ROOT = 2 * Mc * W
    pip_col = piprop_ref[...].reshape(CA, 1)
    for g in range(G):
        buf, ls = scratch[2 * g:2 * g + 2]
        _init_tips(buf, ls, tip_ref, tipsb_ref, g, T, CA)

    def step(c, _):
        for g in range(G):
            buf, ls = scratch[2 * g:2 * g + 2]
            _chunk_post(pdst_ref, Lc_ref, buf, ls, g, c, Mc, W, CA)
        return 0

    jax.lax.fori_loop(0, Mc, step, 0)
    for g in range(G):
        buf, ls = scratch[2 * g:2 * g + 2]
        ll_ref[0, pl.ds(g, 1), :] = _root_ll(buf, ls, pip_col, ROOT, CA)


def _grad_kernel(pdst_ref, tip_ref, Lc_ref, Ld_ref,
                 tipsb_ref, pivec_ref, propvec_ref, w_ref,
                 ll_ref, grad_ref, *scratch, Mc, W, T, CA, NPg, G):
    ROOT = 2 * Mc * W
    pivec_col = pivec_ref[...].reshape(CA, 1)
    propcol = propvec_ref[...].reshape(CA, 1)
    propcol2W = jnp.concatenate([propcol] * (2 * W), axis=0)
    pip_col = pivec_col * propcol
    w = w_ref[...]                                # [1, S]
    R = _row_selector(W, CA)

    for g in range(G):
        buf, ls = scratch[2 * g:2 * g + 2]
        _init_tips(buf, ls, tip_ref, tipsb_ref, g, T, CA)

    def step(c, _):
        for g in range(G):
            buf, ls = scratch[2 * g:2 * g + 2]
            _chunk_post(pdst_ref, Lc_ref, buf, ls, g, c, Mc, W, CA)
        return 0

    jax.lax.fori_loop(0, Mc, step, 0)

    grad_ref[...] = jnp.zeros_like(grad_ref)
    for g in range(G):
        buf, ls = scratch[2 * g:2 * g + 2]
        ll_ref[0, pl.ds(g, 1), :] = _root_ll(buf, ls, pip_col, ROOT, CA)
        # Seed the outside recursion: the root's "up" is pi, written over
        # the root partial (already consumed by the LL above).
        buf[pl.ds(ROOT * CA, CA), :] = jnp.broadcast_to(
            pivec_col, (CA, buf.shape[1]))

    def pre_step(q, _):
        c = Mc - 1 - q
        for g in range(G):
            buf, ls = scratch[2 * g:2 * g + 2]
            _chunk_pre(pdst_ref, Lc_ref, Ld_ref, grad_ref, buf, ls, w,
                       propcol2W, R, g, c, Mc, W, CA, NPg)
        return 0

    jax.lax.fori_loop(0, Mc, pre_step, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _pick_group(B: int, group) -> int:
    if group is not None:
        return group if B % group == 0 else 1
    for g in (4, 2):
        if B % g == 0:
            return g
    return 1


@functools.partial(jax.jit, static_argnames=(
    "Mc", "W", "T", "CA", "s_tile", "group", "interpret"))
def chunked_log_likelihoods(
    post_dst, tip_slot, P_blk, post_e, tips_flat, piprop, weights,
    *, Mc, W, T, CA, s_tile, group=None, interpret=False,
):
    """Per-tree log likelihoods via the chunked level-synchronous kernel.

    post_dst [B, Mc*W], tip_slot [B, T], P_blk [B, N+1, CA, CA] f32,
    post_e [B, Mc*W, 2], tips_flat [T*CA, S] f32, piprop [1, CA],
    weights [S]."""
    B = post_dst.shape[0]
    S = tips_flat.shape[1]
    assert S % s_tile == 0, (S, s_tile)
    G = _pick_group(B, group)
    MW = Mc * W
    NS = 2 * MW + 2
    Lc = pack_expanded_operands(P_blk, post_e, W)
    tipsb = tips_flat.astype(jnp.bfloat16)
    grid = (B // G, S // s_tile)

    out = pl.pallas_call(
        functools.partial(_ll_kernel, Mc=Mc, W=W, T=T, CA=CA, G=G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G * MW), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G * T), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G * Mc, 4 * W * CA, 2 * W * CA),
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
            pltpu.VMEM((NS * CA, s_tile), jnp.float32) if i % 2 == 0 else
            pltpu.VMEM((NS, s_tile), jnp.float32)
            for i in range(2 * G)
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(post_dst.reshape(B // G, 1, G * MW),
      tip_slot.reshape(B // G, 1, G * T),
      Lc.reshape(B // G, G * Mc, 4 * W * CA, 2 * W * CA), tipsb, piprop)
    return out.reshape(B, S) @ weights


def _chunked_grad_rows(
    post_dst, tip_slot, post_e,
    P_blk, dP_blk, tips_flat, pivec, propvec, weights,
    *, Mc, W, T, CA, s_tile, group=None, interpret=False,
):
    """Kernel dispatch returning per-pattern rows: (ll_rows [B, S],
    weighted gradient GRID rows [B, NPg, S]; map grid rows to node rows
    with ChunkedEncoding.node_row outside)."""
    B = post_dst.shape[0]
    S = tips_flat.shape[1]
    assert S % s_tile == 0, (S, s_tile)
    G = _pick_group(B, group)
    MW = Mc * W
    NS = 2 * MW + 2
    NPg = _rup(2 * MW + 1, 8)
    Lc = pack_expanded_operands(P_blk, post_e, W)
    Ld = pack_expanded_operands(dP_blk, post_e, W)
    tipsb = tips_flat.astype(jnp.bfloat16)
    w2 = weights.reshape(1, S)
    grid = (B // G, S // s_tile)

    ll, wgrad = pl.pallas_call(
        functools.partial(_grad_kernel, Mc=Mc, W=W, T=T, CA=CA,
                          NPg=NPg, G=G),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G * MW), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G * T), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G * Mc, 4 * W * CA, 2 * W * CA),
                         lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G * Mc, 4 * W * CA, 2 * W * CA),
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
            pltpu.VMEM((NS * CA, s_tile), jnp.float32) if i % 2 == 0 else
            pltpu.VMEM((NS, s_tile), jnp.float32)
            for i in range(2 * G)
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(post_dst.reshape(B // G, 1, G * MW),
      tip_slot.reshape(B // G, 1, G * T),
      Lc.reshape(B // G, G * Mc, 4 * W * CA, 2 * W * CA),
      Ld.reshape(B // G, G * Mc, 4 * W * CA, 2 * W * CA),
      tipsb, pivec, propvec, w2)
    return ll.reshape(B, S), wgrad.reshape(B, NPg, S)


@functools.partial(jax.jit, static_argnames=(
    "Mc", "W", "T", "CA", "num_slots", "s_tile", "group", "interpret"))
def chunked_ll_and_gradients(
    post_dst, tip_slot, post_e, node_row, edge_mask,
    P_blk, dP_blk, tips_flat, pivec, propvec, weights,
    *, Mc, W, T, CA, num_slots, s_tile, group=None, interpret=False,
):
    """Per-tree (log likelihood [B], branch gradients [B, num_slots])."""
    ll_rows, wgrad = _chunked_grad_rows(
        post_dst, tip_slot, post_e, P_blk, dP_blk, tips_flat,
        pivec, propvec, weights, Mc=Mc, W=W, T=T, CA=CA, s_tile=s_tile,
        group=group, interpret=interpret)
    ll_total = ll_rows @ weights
    grid_grads = wgrad.sum(axis=2)                   # [B, NPg]
    grads = jnp.take_along_axis(grid_grads, node_row, axis=1) * edge_mask
    return ll_total, grads


def _shard_tile(S: int, n_dev: int) -> int:
    s_local = S // n_dev
    if s_local <= 1024:
        return s_local
    for t in (1024, 512, 256, 128):
        if s_local % t == 0:
            return t
    return s_local


def chunked_ll_and_gradients_sharded(
    mesh, axis, post_dst, tip_slot, post_e, node_row, edge_mask,
    P_blk, dP_blk, tips_flat, pivec, propvec, weights,
    *, Mc, W, T, CA, num_slots, group=None, interpret=False,
):
    """Pattern-sharded chunked kernel (SURVEY P2+P5 composed): each device
    runs the same VMEM-resident kernel on its local pattern shard under
    shard_map; per-tree reductions ride one psum over the mesh."""
    from jax.sharding import PartitionSpec as PS

    n_dev = mesh.shape[axis]
    S = tips_flat.shape[1]
    assert S % n_dev == 0, (S, n_dev)
    s_tile = _shard_tile(S, n_dev)

    def local_fn(tips_l, w_l, post_dst, tip_slot, post_e, node_row,
                 edge_mask, P_blk, dP_blk, pivec, propvec):
        ll_rows, wgrad = _chunked_grad_rows(
            post_dst, tip_slot, post_e, P_blk, dP_blk, tips_l,
            pivec, propvec, w_l, Mc=Mc, W=W, T=T, CA=CA,
            s_tile=s_tile, group=group, interpret=interpret)
        ll = jax.lax.psum(ll_rows @ w_l, axis)
        gg = jax.lax.psum(wgrad.sum(axis=2), axis)
        return ll, jnp.take_along_axis(gg, node_row, axis=1) * edge_mask

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(PS(None, axis), PS(axis), PS(), PS(), PS(), PS(),
                  PS(), PS(), PS(), PS(), PS()),
        out_specs=(PS(), PS()),
        # pallas_call outputs carry no varying-mesh-axes metadata; the
        # explicit psums above establish the replication.
        check_vma=False,
    )
    return fn(tips_flat, weights, post_dst, tip_slot, post_e, node_row,
              edge_mask, P_blk, dP_blk, pivec, propvec)


def chunked_log_likelihoods_sharded(
    mesh, axis, post_dst, tip_slot, P_blk, post_e, tips_flat, piprop,
    weights, *, Mc, W, T, CA, group=None, interpret=False,
):
    """Pattern-sharded LL-only chunked kernel."""
    from jax.sharding import PartitionSpec as PS

    n_dev = mesh.shape[axis]
    S = tips_flat.shape[1]
    assert S % n_dev == 0, (S, n_dev)
    s_tile = _shard_tile(S, n_dev)

    def local_fn(tips_l, w_l, post_dst, tip_slot, P_blk, post_e, piprop):
        ll = chunked_log_likelihoods(
            post_dst, tip_slot, P_blk, post_e, tips_l, piprop, w_l,
            Mc=Mc, W=W, T=T, CA=CA, s_tile=s_tile, group=group,
            interpret=interpret)
        return jax.lax.psum(ll, axis)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(PS(None, axis), PS(axis), PS(), PS(), PS(), PS(), PS()),
        out_specs=PS(),
        check_vma=False,
    )
    return fn(tips_flat, weights, post_dst, tip_slot, P_blk, post_e,
              piprop)
