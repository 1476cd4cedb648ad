"""Ablation lab for the chunked kernel: which part of the ~4 us/chunk
step costs what.  Monkeypatches pallas_chunked internals per variant and
re-jits the unjitted wrapper.  LL-only post pass (the minimal loop).

Usage: python scripts/perf_chunk_lab.py v0 unroll norescale fixstore nosplit
"""
import sys
import time
import functools

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bito_tpu.core.newick import parse_nexus_file, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.models.phylo_model import PhyloModel, PhyloModelSpecification
from bito_tpu.treelike.engine import TreeLikelihoodEngine
from bito_tpu.treelike import pallas_pruning as pp
from bito_tpu.treelike import pallas_chunked as pc

DATA = "/root/reference/data"
ABLATE = set()


def _init_tips_ablate(buf, ls, tip_ref, tipsb_ref, g, T, CA):
    import jax

    if "noinit" not in ABLATE:
        buf[...] = jnp.ones_like(buf)
    ls[...] = jnp.zeros_like(ls)
    if "notips" not in ABLATE:
        def tip_body(t, _):
            slot = tip_ref[0, 0, g * T + t]
            buf[pl.ds(slot * CA, CA), :] = tipsb_ref[
                pl.ds(t * CA, CA), :].astype(buf.dtype)
            return 0
        jax.lax.fori_loop(0, T, tip_body, 0)


def _ll_kernel_unroll(pdst_ref, tip_ref, Lc_ref, tipsb_ref, piprop_ref,
                      ll_ref, *scratch, Mc, W, T, CA, G):
    ROOT = 2 * Mc * W
    pip_col = piprop_ref[...].reshape(CA, 1)
    for g in range(G):
        buf, ls = scratch[2 * g:2 * g + 2]
        pc._init_tips(buf, ls, tip_ref, tipsb_ref, g, T, CA)
    for c in range(Mc):
        for g in range(G):
            buf, ls = scratch[2 * g:2 * g + 2]
            pc._chunk_post(pdst_ref, Lc_ref, buf, ls, g, c, Mc, W, CA)
    for g in range(G):
        buf, ls = scratch[2 * g:2 * g + 2]
        ll_ref[0, pl.ds(g, 1), :] = pc._root_ll(buf, ls, pip_col, ROOT, CA)


def _chunk_post_ablate(pdst_ref, Lc_ref, buf, ls, g, c, Mc, W, CA):
    ev, _, _ = pc._chunk_evolve(Lc_ref, g * Mc + c, buf, c, W, CA,
                                with_d=False)
    MW = Mc * W
    for k in range(W):
        e1 = ev[2 * k * CA:(2 * k + 1) * CA]
        e2 = ev[(2 * k + 1) * CA:(2 * k + 2) * CA]
        prod = e1 * e2
        l1 = ls[pl.ds(2 * (c * W + k), 1), :]
        l2 = ls[pl.ds(2 * (c * W + k) + 1, 1), :]
        if "norescale" in ABLATE:
            new_ls = l1 + l2
        else:
            mx = jnp.max(prod, axis=0, keepdims=True)
            mx = jnp.where(mx > 0, mx, 1.0)
            prod = prod / mx
            new_ls = l1 + l2 + jnp.log(mx)
        dst = pdst_ref[0, 0, g * MW + c * W + k]
        if "fixstore" in ABLATE:
            base = 2 * W * CA * ((c + 1) % Mc)
            buf[pl.ds(base + k * CA, CA), :] = prod
            ls[pl.ds(2 * W * ((c + 1) % Mc) + k, 1), :] = new_ls
        elif "blockstore" in ABLATE:
            if k == W - 1:
                allprod = jnp.concatenate(
                    [ev[2 * q * CA:(2 * q + 1) * CA]
                     * ev[(2 * q + 1) * CA:(2 * q + 2) * CA]
                     for q in range(W)], axis=0)
                buf[pl.ds(2 * W * CA * ((c + 1) % Mc), W * CA), :] = allprod
                ls[pl.ds(dst, 1), :] = new_ls
        else:
            buf[pl.ds(dst * CA, CA), :] = prod
            ls[pl.ds(dst, 1), :] = new_ls


_orig_evolve = pc._chunk_evolve
_orig_ll_kernel = pc._ll_kernel
_orig_init_tips = pc._init_tips


def _chunk_evolve_ablate(Lc_ref, idx, buf, c, W, CA, with_d,
                         Ld_ref=None):
    n = 2 * W * CA
    base = 2 * W * CA * c
    rows = buf[pl.ds(base, 2 * W * CA), :]
    Lst = Lc_ref[0, idx]
    if "nosplit" in ABLATE:
        rh = rows.astype(jnp.bfloat16)
        big = pc._dot(Lst, rh)
        ev = big[0:n] + big[n:2 * n]
        return ev, None, (Lst[0:n], Lst[n:2 * n])
    if "nodot" in ABLATE:
        rh_f, rl_f = pc._trunc_split(rows)
        ev = rh_f + rl_f
        return ev, None, (Lst[0:n], Lst[n:2 * n])
    return _orig_evolve(Lc_ref, idx, buf, c, W, CA, with_d, Ld_ref)


def main():
    coll = parse_nexus_file(f"{DATA}/DS1.subsampled_10.t")
    seqs = read_fasta(f"{DATA}/DS1.fasta")
    sp = SitePattern(seqs, coll.taxon_names)
    model = PhyloModel(PhyloModelSpecification(substitution="GTR",
                                               site="gamma+4"))
    engine = TreeLikelihoodEngine(sp, model)
    batch, iters = 200, 40
    trees = [coll.trees[i % len(coll.trees)] for i in range(batch)]
    params = {
        "substitution_model_rates": jnp.asarray(
            [0.1, 0.3, 0.1, 0.2, 0.25, 0.05]),
        "substitution_model_frequencies": jnp.asarray([0.3, 0.25, 0.2, 0.25]),
        "site_model_parameters": jnp.asarray([0.5]),
    }
    enc = engine.encode(trees)
    base_bl = engine.branch_length_matrix(trees, enc)
    eig, rates, props, clock = engine._model_ingredients(params, batch)
    tips = engine._pallas_tips()
    weights = sp.weights
    CA = 16
    ces = {}

    def get_ce(W):
        if W not in ces:
            ce = pc.build_chunked_encoding(enc, W=W)
            ces[W] = (ce, jnp.asarray(ce.post_dst),
                      jnp.asarray(ce.tip_slot), jnp.asarray(ce.post_e))
        return ces[W]

    raw_ll = pc.chunked_log_likelihoods.__wrapped__

    for name in sys.argv[1:] or ["v0"]:
        ABLATE.clear()
        parts = name.split("+")
        group = 2
        W = 4
        for p in parts:
            if p.startswith("g") and p[1:].isdigit():
                group = int(p[1:])
            elif p.startswith("w") and p[1:].isdigit():
                W = int(p[1:])
            elif p != "v0":
                ABLATE.add(p)
        ce, cdst, ctip, cpost_e = get_ce(W)
        pc._chunk_post = _chunk_post_ablate
        pc._chunk_evolve = _chunk_evolve_ablate
        pc._init_tips = _init_tips_ablate
        if "unroll" in ABLATE:
            pc._ll_kernel = _ll_kernel_unroll
        else:
            pc._ll_kernel = _orig_ll_kernel
        fresh = functools.partial(
            jax.jit, static_argnames=("Mc", "W", "T", "CA", "s_tile",
                                      "group", "interpret"))(raw_ll)

        def fn(bl):
            P_blk, tips_flat, piprop, w = pp.prepare_inputs(
                enc, tips, weights, eig, rates, props, clock, bl,
                engine.pattern_pad)
            ll = fresh(cdst, ctip, P_blk, cpost_e, tips_flat, piprop, w,
                       Mc=ce.Mc, W=ce.W, T=ce.num_taxa, CA=CA,
                       s_tile=1024, group=group)
            return ll

        if "preponly" in ABLATE:
            # Time prepare_inputs + operand packing alone (no kernel).
            @jax.jit
            def sweep(bl):
                def body(carry, k):
                    P_blk, tips_flat, piprop, w = pp.prepare_inputs(
                        enc, tips, weights, eig, rates, props, clock,
                        bl * (1.0 + 0.001 * k), engine.pattern_pad)
                    Lc = pc.pack_expanded_operands(P_blk, cpost_e, W)
                    return carry + Lc.astype(jnp.float32).sum()                         + tips_flat.sum(), 0.0
                total, _ = jax.lax.scan(
                    body, jnp.zeros((), base_bl.dtype),
                    jnp.arange(iters, dtype=base_bl.dtype))
                return total
        elif "fixedop" in ABLATE:
            # Hoist ALL operand prep out of the timed loop: kernel-only
            # time, sweeping over tips scale so XLA cannot hoist the call.
            P_blk0, tips_flat0, piprop0, w0 = jax.jit(
                lambda bl: pp.prepare_inputs(
                    enc, tips, weights, eig, rates, props, clock, bl,
                    engine.pattern_pad))(base_bl)

            @jax.jit
            def sweep(bl):
                def body(carry, k):
                    ll = fresh(cdst, ctip, P_blk0, cpost_e,
                               tips_flat0 * (1.0 + 1e-4 * k), piprop0, w0,
                               Mc=ce.Mc, W=ce.W, T=ce.num_taxa, CA=CA,
                               s_tile=1024, group=group)
                    return carry + ll.sum(), 0.0
                total, _ = jax.lax.scan(
                    body, jnp.zeros((), base_bl.dtype),
                    jnp.arange(iters, dtype=base_bl.dtype))
                return total
        else:
            @jax.jit
            def sweep(bl):
                def body(carry, k):
                    return carry + fn(bl * (1.0 + 0.001 * k)).sum(), 0.0
                total, _ = jax.lax.scan(
                    body, jnp.zeros((), base_bl.dtype),
                    jnp.arange(iters, dtype=base_bl.dtype))
                return total

        t0 = time.perf_counter()
        sweep(base_bl).block_until_ready()
        comp = time.perf_counter() - t0
        times = []
        for r in range(5):
            t0 = time.perf_counter()
            sweep(base_bl * (1.0 + 1e-4 * r)).block_until_ready()
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{name:22s} compile {comp:5.1f}s best {best:.3f}s "
              f"{batch * iters / best:9.0f} evals/s", flush=True)


if __name__ == "__main__":
    main()
