"""Perf lab for the Pallas pruning kernel (round-3 profiling).

Times kernel variants against the shipping `pallas_ll_and_gradients` on the
DS1 bench workload to locate the bottleneck (VERDICT r2: 21.4k evals/s flat,
no profile existed).  Variants are self-contained copies so the product
kernel stays untouched while measuring.

Usage:  python scripts/perf_lab.py [variant ...]
Variants: base, unroll, resk4, nodot, pack4
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from bito_tpu.core.newick import parse_nexus_file, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.models.phylo_model import PhyloModel, PhyloModelSpecification
from bito_tpu.treelike.engine import TreeLikelihoodEngine
from bito_tpu.treelike import pallas_pruning as pp

DATA = "/root/reference/data"


def _hi(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def make_variant_kernel(*, M, Mp, T, CA, N1, unroll, resk, nodot):
    """A copy of pp._grad_kernel with experiment knobs."""

    def pair_evolve(P_ref, buf, e1, s1, e2, s2, L1, L2, bpair):
        if nodot:
            return (buf[pl.ds(s1 * CA, CA), :], buf[pl.ds(s2 * CA, CA), :])
        return pp._pair_dot(P_ref[0, e1], P_ref[0, e2],
                            buf[pl.ds(s1 * CA, CA), :],
                            buf[pl.ds(s2 * CA, CA), :], L1, L2, bpair, CA)

    def kernel(ops_ref, pre_ref, P_ref, dP_ref, tips_ref, pivec_ref,
               propvec_ref, w_ref, ll_ref, grad_ref, buf, up, ls, L1, L2,
               bpair):
        buf[...] = jnp.ones_like(buf)
        buf[0:T * CA, :] = tips_ref[...]
        ls[...] = jnp.zeros_like(ls)
        L1[...] = jnp.zeros_like(L1)
        L2[...] = jnp.zeros_like(L2)

        def body(m, rescale):
            dest = ops_ref[0, m, 0]
            s1 = ops_ref[0, m, 1]
            e1 = ops_ref[0, m, 2]
            s2 = ops_ref[0, m, 3]
            e2 = ops_ref[0, m, 4]
            ev1, ev2 = pair_evolve(P_ref, buf, e1, s1, e2, s2, L1, L2, bpair)
            prod = ev1 * ev2
            new_ls = ls[pl.ds(s1, 1), :] + ls[pl.ds(s2, 1), :]
            if rescale:
                mx = jnp.max(prod, axis=0, keepdims=True)
                mx = jnp.where(mx > 0, mx, 1.0)
                prod = prod / mx
                new_ls = new_ls + jnp.log(mx)
            buf[pl.ds(dest * CA, CA), :] = prod
            ls[pl.ds(dest, 1), :] = new_ls
            return 0

        if unroll:
            for m in range(M):
                body(m, resk == 1 or (m % resk == resk - 1))
        else:
            jax.lax.fori_loop(0, M, lambda m, _: body(m, True), 0)
        root = ops_ref[0, M, 0]
        piprop = pivec_ref[...] * propvec_ref[...]
        pr = buf[pl.ds(root * CA, CA), :]
        site = pp._mxu_dot(piprop, pr)
        ll_ref[...] = (jnp.log(site) + ls[pl.ds(root, 1), :])[None]

        grad_ref[...] = jnp.zeros_like(grad_ref)
        up[...] = jnp.zeros_like(up)
        pivec_col = pivec_ref[...].reshape(CA, 1)
        up[pl.ds(root * CA, CA), :] = jnp.broadcast_to(
            pivec_col, up[pl.ds(root * CA, CA), :].shape)
        propvec = propvec_ref[...]
        w = w_ref[...]

        def pre_body(m, rescale):
            dest = pre_ref[0, m, 0]
            parent = pre_ref[0, m, 1]
            s1 = pre_ref[0, m, 2]
            e1 = pre_ref[0, m, 3]
            s2 = pre_ref[0, m, 4]
            e2 = pre_ref[0, m, 5]
            ev1, ev2 = pair_evolve(P_ref, buf, e1, s1, e2, s2, L1, L2, bpair)
            o = up[pl.ds(parent * CA, CA), :] * ev1 * ev2
            if rescale:
                mx = jnp.max(o, axis=0, keepdims=True)
                mx = jnp.where(mx > 0, mx, 1.0)
                o = o / mx
            p = buf[pl.ds(dest * CA, CA), :]
            Pd = P_ref[0, dest]
            if nodot:
                Pp, dPp = p, p
            else:
                Pp, dPp = pp._pair_dot(Pd, dP_ref[0, dest], p, p, L1, L2,
                                       bpair, CA)
            den = pp._mxu_dot(propvec, o * Pp)
            num = pp._mxu_dot(propvec, o * dPp)
            den = jnp.where(den > 0, den, 1.0)
            grad_ref[0, pl.ds(dest, 1), :] = w * num / den
            Pt = Pd.T
            Pth = _hi(Pt)
            L1[0:CA, 0:CA] = Pth
            L1[CA:2 * CA, 0:CA] = Pt - Pth
            o_hi = _hi(o)
            d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
            if nodot:
                up[pl.ds(dest * CA, CA), :] = o
            else:
                big = d(L1[0:2 * CA, 0:CA], o_hi)
                up[pl.ds(dest * CA, CA), :] = (big[0:CA] + big[CA:2 * CA]
                                               + d(Pth, o - o_hi))
            return 0

        if unroll:
            for m in range(Mp):
                pre_body(m, resk == 1 or (m % resk == resk - 1))
        else:
            jax.lax.fori_loop(0, Mp, lambda m, _: pre_body(m, True), 0)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "num_slots", "category_count", "s_tile", "unroll", "resk", "nodot"))
def variant_ll_and_gradients(
    post_ops, pre_ops, root, edge_mask, P_blk, dP_blk, tips_flat, pivec,
    propvec, weights, *, num_slots, category_count, s_tile, unroll, resk,
    nodot,
):
    B, M, _ = post_ops.shape
    Mp = pre_ops.shape[1]
    ops_ext = jnp.concatenate(
        [post_ops, jnp.broadcast_to(root.reshape(B, 1, 1),
                                    (B, 1, 5)).astype(post_ops.dtype)],
        axis=1)
    CA = pivec.shape[1]
    T = tips_flat.shape[0] // CA
    S = tips_flat.shape[1]
    N1 = num_slots + 1
    NP = -(-N1 // 8) * 8
    w2 = weights.reshape(1, S)
    grid = (B, S // s_tile)
    kern = make_variant_kernel(M=M, Mp=Mp, T=T, CA=CA, N1=N1, unroll=unroll,
                               resk=resk, nodot=nodot)
    ll, wgrad = pl.pallas_call(
        kern,
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
    )(ops_ext, pre_ops, P_blk, dP_blk, tips_flat, pivec, propvec, w2)
    ll_total = ll[:, 0, :] @ weights
    grads = wgrad.sum(axis=2)[:, :num_slots] * edge_mask
    return ll_total, grads


def main():
    variants = sys.argv[1:] or ["base", "unroll", "resk4", "nodot"]
    coll = parse_nexus_file(f"{DATA}/DS1.subsampled_10.t")
    seqs = read_fasta(f"{DATA}/DS1.fasta")
    sp = SitePattern(seqs, coll.taxon_names)
    model = PhyloModel(PhyloModelSpecification(substitution="GTR",
                                               site="gamma+4"))
    engine = TreeLikelihoodEngine(sp, model)
    batch = 200
    trees = [coll.trees[i % len(coll.trees)] for i in range(batch)]
    params = {
        "substitution_model_rates": jnp.asarray(
            [0.1, 0.3, 0.1, 0.2, 0.25, 0.05]),
        "substitution_model_frequencies": jnp.asarray(
            [0.3, 0.25, 0.2, 0.25]),
        "site_model_parameters": jnp.asarray([0.5]),
    }
    enc = engine.encode(trees)
    bl = engine.branch_length_matrix(trees, enc)
    eig, rates, props, clock = engine._model_ingredients(params, batch)
    kargs = pp.prepare_inputs_grad(enc, engine._pallas_tips(),
                                   sp.weights, eig, rates, props, clock, bl,
                                   engine.pattern_pad)
    post_ops = jnp.asarray(enc.post_ops)
    pre_ops = jnp.asarray(enc.pre_ops)
    root = jnp.asarray(enc.root)
    edge_mask = jnp.asarray(enc.edge_mask, jnp.float32)
    common = dict(num_slots=enc.num_slots,
                  category_count=model.category_count)

    def timeit(fn, label):
        t0 = time.perf_counter()
        ll, g = fn()
        ll.block_until_ready()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            ll, g = fn()
            ll.block_until_ready()
            times.append(time.perf_counter() - t0)
        best = min(times)
        rate = batch / best
        print(f"{label:28s} compile {compile_s:6.1f}s  best "
              f"{best * 1e3:7.2f}ms  {rate:9.0f} evals/s  "
              f"ll[0]={float(ll[0]):.4f}")
        return ll, g

    ll0 = g0 = None
    for v in variants:
        if v == "base":
            fn = lambda: pp.pallas_ll_and_gradients(
                post_ops, pre_ops, root, edge_mask, *kargs,
                s_tile=engine._pallas_s_tile(), **common)
            ll0, g0 = timeit(fn, "base (shipping)")
        elif v in ("unroll", "resk4", "resk8", "nodot", "loop_resk4"):
            cfg = dict(unroll=v != "loop_resk4",
                       resk={"resk4": 4, "resk8": 8, "loop_resk4": 1}.get(
                           v, 1),
                       nodot=v == "nodot")
            if v == "resk4":
                cfg["resk"] = 4
            fn = lambda cfg=cfg: variant_ll_and_gradients(
                post_ops, pre_ops, root, edge_mask, *kargs,
                s_tile=engine._pallas_s_tile(), **common, **cfg)
            ll, g = timeit(fn, v)
            if ll0 is not None and not cfg["nodot"]:
                rel = float(jnp.max(jnp.abs((ll - ll0) / ll0)))
                grel = float(jnp.max(jnp.abs(g - g0))
                             / jnp.max(jnp.abs(g0)))
                print(f"    parity vs base: LL rel {rel:.2e} grad rel "
                      f"{grel:.2e}")


if __name__ == "__main__":
    main()
