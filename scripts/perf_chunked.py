"""Measure the chunked level-synchronous kernel on TPU (DS1 GTR+Gamma4).

Usage: python scripts/perf_chunked.py [cG:TILE[:W] ...] [ll:G:TILE[:W] ...]
Timings are on-device lax.scan sweeps (the axon tunnel adds ~24 ms per
dispatch; sweeps amortize it away).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bito_tpu.core.newick import parse_nexus_file, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.models.phylo_model import PhyloModel, PhyloModelSpecification
from bito_tpu.treelike.engine import TreeLikelihoodEngine
from bito_tpu.treelike import pallas_pruning as pp
from bito_tpu.treelike import pallas_chunked as pc

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
    tips = engine._pallas_tips()
    weights = sp.weights
    edge_mask = jnp.asarray(enc.edge_mask, jnp.float32)
    CA = 16
    ces = {}

    def get_ce(W):
        if W not in ces:
            ce = pc.build_chunked_encoding(enc, W=W)
            ces[W] = (ce, jnp.asarray(ce.post_dst), jnp.asarray(ce.tip_slot),
                      jnp.asarray(ce.post_e), jnp.asarray(ce.node_row))
        return ces[W]

    def make_grad(group, tile, W):
        ce, cdst, ctip, cpost_e, cnode_row = get_ce(W)

        def fn(bl):
            P_blk, dP_blk, tips_flat, pivec, propvec, w = (
                pp.prepare_inputs_grad(enc, tips, weights, eig, rates,
                                       props, clock, bl, engine.pattern_pad))
            return pc.chunked_ll_and_gradients(
                cdst, ctip, cpost_e, cnode_row, edge_mask,
                P_blk, dP_blk, tips_flat, pivec, propvec, w,
                Mc=ce.Mc, W=ce.W, T=ce.num_taxa, CA=CA,
                num_slots=enc.num_slots, s_tile=tile, group=group)
        return fn

    def make_ll(group, tile, W):
        ce, cdst, ctip, cpost_e, _ = get_ce(W)

        def fn(bl):
            P_blk, tips_flat, piprop, w = pp.prepare_inputs(
                enc, tips, weights, eig, rates, props, clock, bl,
                engine.pattern_pad)
            ll = pc.chunked_log_likelihoods(
                cdst, ctip, P_blk, cpost_e, tips_flat, piprop, w,
                Mc=ce.Mc, W=ce.W, T=ce.num_taxa, CA=CA,
                s_tile=tile, group=group)
            return ll, jnp.zeros((bl.shape[0], 1))
        return fn

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

    for name in sys.argv[1:] or ["c2:1024", "c4:1024"]:
        parts = name.split(":")
        if parts[0].startswith("ll"):
            g, tile = int(parts[1]), int(parts[2])
            W = int(parts[3]) if len(parts) > 3 else 4
            fn = make_ll(g, tile, W)
        else:
            g, tile = int(parts[0][1:]), int(parts[1])
            W = int(parts[2]) if len(parts) > 2 else 4
            fn = make_grad(g, tile, W)
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
        print(f"{name:12s} compile {compile_s:6.1f}s best {best:.3f}s "
              f"{rate:9.0f} evals/s", flush=True)
        ll = jax.jit(fn)(base_bl)[0]
        print(f"  ll[0] = {float(ll[0]):.4f}", flush=True)


if __name__ == "__main__":
    main()
