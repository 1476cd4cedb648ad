"""Race the scan-tape path against the Pallas fused kernel on the real TPU
at bench.py shapes (DS1 GTR+Gamma4, batch 200), including per-iteration
transition-matrix construction in both paths."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

DATA = "/root/reference/data"


def main():
    from bito_tpu.core.newick import parse_nexus_file, read_fasta
    from bito_tpu.core.site_pattern import SitePattern
    from bito_tpu.models.phylo_model import PhyloModel, PhyloModelSpecification
    from bito_tpu.treelike import pallas_pruning
    from bito_tpu.treelike import pruning as pruning_mod
    from bito_tpu.treelike.engine import TreeLikelihoodEngine

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    coll = parse_nexus_file(f"{DATA}/DS1.subsampled_10.t")
    seqs = read_fasta(f"{DATA}/DS1.fasta")
    sp = SitePattern(seqs, coll.taxon_names)
    spec = PhyloModelSpecification(substitution="GTR", site="gamma+4")
    model = PhyloModel(spec)
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
    post_ops = jnp.asarray(enc.post_ops)
    pre_ops = jnp.asarray(enc.pre_ops)
    root = jnp.asarray(enc.root)
    edge_mask = jnp.asarray(enc.edge_mask, dtype=base_bl.dtype)
    tips32 = jnp.asarray(sp.tip_partials(), jnp.float32)

    @jax.jit
    def sweep_scan(bl):
        def body(carry, k):
            ll, grads = pruning_mod.ll_and_branch_gradients_impl(
                post_ops, pre_ops, root, edge_mask,
                engine.tip_partials, engine.weights,
                bl * (1.0 + 0.001 * k),
                eig, rates, props, clock,
                num_slots=enc.num_slots, pattern_pad=engine.pattern_pad,
                category_count=model.category_count,
            )
            return carry + ll.sum(), grads.sum()
        total, _ = jax.lax.scan(
            body, jnp.zeros((), base_bl.dtype),
            jnp.arange(iters, dtype=base_bl.dtype))
        return total

    @jax.jit
    def sweep_pallas(bl):
        def body(carry, k):
            (P_blk, dP_blk, tips_flat, pivec, propvec, w) = (
                pallas_pruning.prepare_inputs_grad(
                    enc, tips32, sp.weights, eig, rates, props, clock,
                    bl * (1.0 + 0.001 * k), engine.pattern_pad))
            ll, grads = pallas_pruning.pallas_ll_and_gradients(
                post_ops, pre_ops, root,
                jnp.asarray(enc.edge_mask, jnp.float32),
                P_blk, dP_blk, tips_flat, pivec, propvec, w,
                num_slots=enc.num_slots,
                category_count=model.category_count, s_tile=512)
            return carry + ll.sum(), grads.sum()
        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jnp.arange(iters, dtype=jnp.float32))
        return total

    for name, fn, bl in [("scan", sweep_scan, base_bl),
                         ("pallas", sweep_pallas, base_bl)]:
        t0 = time.perf_counter()
        out = fn(bl)
        out.block_until_ready()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for r in range(reps):
            out = fn(bl * (1.0 + 1e-4 * r))
        out.block_until_ready()
        el = time.perf_counter() - t0
        rate = batch * iters * reps / el
        print(f"{name}: compile {compile_s:.1f}s, {rate:,.0f} evals/s "
              f"(total {out:.3f})")


if __name__ == "__main__":
    main()
