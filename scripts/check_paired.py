"""Quick interpret-mode parity check for the paired-slot kernel."""
import sys

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


def check(name, trees, sp, params, spec):
    model = PhyloModel(spec)
    engine = TreeLikelihoodEngine(sp, model)
    enc = engine.encode(trees)
    bl = engine.branch_length_matrix(trees, enc)
    eig, rates, props, clock = engine._model_ingredients(params, len(trees))
    kargs = pp.prepare_inputs_grad(enc, engine._pallas_tips(), sp.weights,
                                   eig, rates, props, clock, bl,
                                   engine.pattern_pad)
    P_blk, dP_blk, tips_flat, pivec, propvec, w = kargs
    pe = ppd.build_paired_encoding(enc)
    CA = pivec.shape[1]
    s_tile = engine._pallas_s_tile()
    ll, grads = ppd.paired_ll_and_gradients(
        jnp.asarray(pe.post_dst), jnp.asarray(pe.tip_slot),
        jnp.asarray(pe.post_src), jnp.asarray(pe.post_e),
        jnp.asarray(enc.edge_mask, jnp.float32),
        P_blk, dP_blk, tips_flat, pivec, propvec, w,
        M=pe.M, T=pe.num_taxa, CA=CA,
        n_pair_slots=pe.n_pair_slots, num_slots=enc.num_slots,
        s_tile=s_tile, interpret=True)
    # LL-only kernel
    piprop = (pivec * propvec)
    ll2 = ppd.paired_log_likelihoods(
        jnp.asarray(pe.post_dst), jnp.asarray(pe.tip_slot),
        P_blk, jnp.asarray(pe.post_e), tips_flat, piprop, w,
        M=pe.M, T=pe.num_taxa, CA=CA, n_pair_slots=pe.n_pair_slots,
        s_tile=s_tile, interpret=True)
    engine.kernel = "scan"
    ll_s, g_s = engine.ll_and_branch_gradients(trees, params)
    rel_ll = float(jnp.max(jnp.abs((ll - ll_s) / ll_s)))
    rel_ll2 = float(jnp.max(jnp.abs((ll2 - ll_s) / ll_s)))
    rel_g = float(jnp.max(jnp.abs(grads - g_s)) / jnp.max(jnp.abs(g_s)))
    print(f"{name:24s} LL rel {rel_ll:.2e}  LLonly rel {rel_ll2:.2e}  "
          f"grad rel {rel_g:.2e}  ll[0]={float(ll[0]):.4f} "
          f"scan={float(ll_s[0]):.4f}")
    assert rel_ll < 2e-4 and rel_ll2 < 2e-4 and rel_g < 2e-4, name


def main():
    gtr = {
        "substitution_model_rates": jnp.asarray(
            [0.1, 0.3, 0.1, 0.2, 0.25, 0.05]),
        "substitution_model_frequencies": jnp.asarray([0.3, 0.25, 0.2, 0.25]),
        "site_model_parameters": jnp.asarray([0.5]),
    }
    spec = PhyloModelSpecification(substitution="GTR", site="gamma+4")

    from bito_tpu.core.newick import parse_newick_file

    coll = parse_newick_file(f"{DATA}/five_taxon_unrooted.nwk")
    seqs = read_fasta(f"{DATA}/five_taxon.fasta")
    sp = SitePattern(seqs, coll.taxon_names)
    rng = np.random.default_rng(0)
    trees = coll.trees[:4]
    for t in trees:
        t.branch_lengths[:] = rng.uniform(0.02, 0.4, t.branch_lengths.shape)
    check("five_taxon_unrooted", trees, sp, gtr, spec)

    coll = parse_nexus_file(f"{DATA}/DS1.subsampled_10.t")
    seqs = read_fasta(f"{DATA}/DS1.fasta")
    sp = SitePattern(seqs, coll.taxon_names)
    check("DS1 x10", coll.trees, sp, gtr, spec)


if __name__ == "__main__":
    main()
