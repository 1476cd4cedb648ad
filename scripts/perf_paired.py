"""Time the paired-slot kernel vs the shipping kernel on the bench workload
(DS1 GTR+Gamma4, batch 200, 40-iteration on-device sweep like bench.py)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bito_tpu.core.newick import parse_nexus_file, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.models.phylo_model import PhyloModel, PhyloModelSpecification
from bito_tpu.treelike.engine import TreeLikelihoodEngine
from bito_tpu.treelike import pallas_pruning as pp
from bito_tpu.treelike import pallas_paired as ppd

DATA = "/root/reference/data"


def main():
    coll = parse_nexus_file(f"{DATA}/DS1.subsampled_10.t")
    seqs = read_fasta(f"{DATA}/DS1.fasta")
    sp = SitePattern(seqs, coll.taxon_names)
    model = PhyloModel(PhyloModelSpecification(substitution="GTR",
                                               site="gamma+4"))
    engine = TreeLikelihoodEngine(sp, model)
    batch = 200
    iters = 40
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
    pe = ppd.build_paired_encoding(enc)
    pe_post_dst = jnp.asarray(pe.post_dst)
    pe_tip = jnp.asarray(pe.tip_slot)
    pe_post_src = jnp.asarray(pe.post_src)
    pe_post_e = jnp.asarray(pe.post_e)
    edge_mask = jnp.asarray(enc.edge_mask, jnp.float32)
    tips = engine._pallas_tips()
    weights = sp.weights
    s_tile = engine._pallas_s_tile()
    CA = 16

    def make_paired_eval(group, tile):
        def fn(bl):
            P_blk, dP_blk, tips_flat, pivec, propvec, w = (
                pp.prepare_inputs_grad_q(enc, tips, weights, eig, rates,
                                         props, clock, bl,
                                         engine.pattern_pad))
            return ppd.paired_ll_and_gradients(
                pe_post_dst, pe_tip, pe_post_src, pe_post_e,
                edge_mask, P_blk, dP_blk, tips_flat, pivec, propvec, w,
                M=pe.M, T=pe.num_taxa, CA=CA,
                n_pair_slots=pe.n_pair_slots, num_slots=enc.num_slots,
                s_tile=tile, group=group)
        return fn
    paired_eval = make_paired_eval(1, s_tile)

    def old_eval(bl):
        kargs = pp.prepare_inputs_grad(enc, tips, weights, eig, rates,
                                       props, clock, bl, engine.pattern_pad)
        return pp.pallas_ll_and_gradients(
            jnp.asarray(enc.post_ops), jnp.asarray(enc.pre_ops),
            jnp.asarray(enc.root), edge_mask, *kargs,
            num_slots=enc.num_slots, category_count=4, s_tile=s_tile)

    paired512_eval = make_paired_eval(1, 512)

    def make_llonly(group):
        def fn(bl):
            P_blk, tips_flat, piprop, w = pp.prepare_inputs(
                enc, tips, weights, eig, rates, props, clock, bl,
                engine.pattern_pad)
            ll = ppd.paired_log_likelihoods(
                pe_post_dst, pe_tip, P_blk, pe_post_e, tips_flat, piprop, w,
                M=pe.M, T=pe.num_taxa, CA=CA, n_pair_slots=pe.n_pair_slots,
                s_tile=s_tile, group=group)
            return ll, jnp.zeros((bl.shape[0], 1))
        return fn
    llonly_eval = make_llonly(1)
    llonly2_eval = make_llonly(2)

    def sweep_of(fn):
        @jax.jit
        def sweep(bl):
            def body(carry, k):
                ll, grads = fn(bl * (1.0 + 0.001 * k))
                return carry + ll.sum(), grads.sum()
            total, _ = jax.lax.scan(
                body, jnp.zeros((), base_bl.dtype),
                jnp.arange(iters, dtype=base_bl.dtype))
            return total
        return sweep

    which = sys.argv[1:] or ["old", "paired"]
    for name in which:
        if name.startswith("g") and ":" in name:
            gg, tile = name[1:].split(":")
            fn = make_paired_eval(int(gg), int(tile))
        elif name.startswith("llg"):
            fn = make_llonly(int(name[3:]))
        else:
            fn = {"old": old_eval, "paired": paired_eval,
                  "paired512": paired512_eval, "llonly": llonly_eval,
                  "llonly2": llonly2_eval}[name]
        sweep = sweep_of(fn)
        t0 = time.perf_counter()
        sweep(base_bl).block_until_ready()
        compile_s = time.perf_counter() - t0
        times = []
        for r in range(5):
            t0 = time.perf_counter()
            sweep(base_bl * (1.0 + 1e-4 * r)).block_until_ready()
            times.append(time.perf_counter() - t0)
        best = min(times)
        rate = batch * iters / best
        print(f"{name:8s} compile {compile_s:6.1f}s best {best:.3f}s "
              f"{rate:9.0f} evals/s")
        ll, g = jax.jit(fn)(base_bl)
        print(f"  ll[0] = {float(ll[0]):.4f}")


if __name__ == "__main__":
    main()
