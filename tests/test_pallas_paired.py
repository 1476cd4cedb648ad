"""Paired-slot Pallas kernel (treelike/pallas_paired.py) parity tests.

Interpret-mode on CPU against the f64 scan tape; real-TPU parity is guarded
by bench.py's kernel-vs-kernel check on every bench run.
"""
import numpy as np
import pytest

from bito_tpu.core.newick import parse_newick_file, parse_nexus_file, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.models.phylo_model import PhyloModel, PhyloModelSpecification
from bito_tpu.treelike.engine import TreeLikelihoodEngine
from bito_tpu.treelike import pallas_pruning
from bito_tpu.treelike import pallas_paired

GTR_PARAMS = None


def _params():
    import jax.numpy as jnp

    return {
        "substitution_model_rates": jnp.asarray(
            [0.1, 0.3, 0.1, 0.2, 0.25, 0.05]),
        "substitution_model_frequencies": jnp.asarray([0.3, 0.25, 0.2, 0.25]),
        "site_model_parameters": jnp.asarray([0.5]),
    }


def _run_paired(engine, trees, params, group):
    import jax.numpy as jnp

    enc = engine.encode(trees)
    bl = engine.branch_length_matrix(trees, enc)
    eig, rates, props, clock = engine._model_ingredients(params, len(trees))
    sp = engine.site_pattern
    P_blk, dP_blk, tips_flat, pivec, propvec, w = (
        pallas_pruning.prepare_inputs_grad_q(
            enc, jnp.asarray(sp.tip_partials(), jnp.float32), sp.weights,
            eig, rates, props, clock, bl, engine.pattern_pad))
    pe = pallas_paired.build_paired_encoding(enc)
    CA = pivec.shape[1]
    ll, grads = pallas_paired.paired_ll_and_gradients(
        jnp.asarray(pe.post_dst), jnp.asarray(pe.tip_slot),
        jnp.asarray(pe.post_src), jnp.asarray(pe.post_e),
        jnp.asarray(enc.edge_mask, jnp.float32),
        P_blk, dP_blk, tips_flat, pivec, propvec, w,
        M=pe.M, T=pe.num_taxa, CA=CA, n_pair_slots=pe.n_pair_slots,
        num_slots=enc.num_slots, s_tile=engine._pallas_s_tile(),
        group=group, interpret=True)
    llo = pallas_paired.paired_log_likelihoods(
        jnp.asarray(pe.post_dst), jnp.asarray(pe.tip_slot), P_blk,
        jnp.asarray(pe.post_e), tips_flat, pivec * propvec, w,
        M=pe.M, T=pe.num_taxa, CA=CA, n_pair_slots=pe.n_pair_slots,
        s_tile=engine._pallas_s_tile(), group=group, interpret=True)
    return np.asarray(ll), np.asarray(grads), np.asarray(llo)


def _check(engine, trees, params, group):
    engine.kernel = "scan"
    ll_ref, g_ref = engine.ll_and_branch_gradients(trees, params)
    ll_ref, g_ref = np.asarray(ll_ref), np.asarray(g_ref)
    ll, grads, llo = _run_paired(engine, trees, params, group)
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-4)
    np.testing.assert_allclose(llo, ll_ref, rtol=1e-4)
    np.testing.assert_allclose(grads, g_ref, rtol=5e-3,
                               atol=5e-4 * np.abs(g_ref).max())


class TestPairedKernel:
    @pytest.mark.parametrize("group", [1, 2])
    def test_ds1_unrooted_parity(self, data_dir, group):
        """Trifurcating-root DS1 trees: LL + gradients vs the scan tape,
        with and without two-tree interleaving."""
        coll = parse_nexus_file(str(data_dir / "DS1.subsampled_10.t"))
        seqs = read_fasta(str(data_dir / "DS1.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        spec = PhyloModelSpecification(substitution="GTR", site="gamma+4")
        engine = TreeLikelihoodEngine(sp, PhyloModel(spec))
        _check(engine, coll.trees[:4], _params(), group)

    def test_rooted_binary_parity(self, data_dir):
        """Binary-root trees (no accumulator ops in the tape)."""
        coll = parse_newick_file(str(data_dir / "five_taxon_rooted.nwk"))
        seqs = read_fasta(str(data_dir / "five_taxon.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        rng = np.random.default_rng(7)
        trees = coll.trees[:2]
        for t in trees:
            t.branch_lengths[:] = rng.uniform(0.02, 0.4,
                                              t.branch_lengths.shape)
        spec = PhyloModelSpecification(substitution="GTR", site="gamma+4")
        engine = TreeLikelihoodEngine(sp, PhyloModel(spec))
        _check(engine, trees, _params(), 2)

    def test_engine_routes_paired(self, data_dir):
        """kernel='pallas_interpret' on a gamma+4 model serves the
        paired-slot kernel through the product engine API."""
        coll = parse_nexus_file(str(data_dir / "DS1.subsampled_10.t"))
        seqs = read_fasta(str(data_dir / "DS1.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        spec = PhyloModelSpecification(substitution="GTR", site="gamma+4")
        import jax.numpy as jnp

        engine = TreeLikelihoodEngine(sp, PhyloModel(spec),
                                      dtype=jnp.float32)
        assert engine._use_paired()
        params = _params()
        trees = coll.trees[:4]
        engine.kernel = "pallas_interpret"
        ll_pl, g_pl = engine.ll_and_branch_gradients(trees, params)
        engine.kernel = "scan"
        ll_s, g_s = engine.ll_and_branch_gradients(trees, params)
        np.testing.assert_allclose(np.asarray(ll_pl), np.asarray(ll_s),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_s),
                                   rtol=5e-3,
                                   atol=5e-4 * np.abs(np.asarray(g_s)).max())

    def test_jc_model_served_via_category_padding(self, data_dir):
        """CA=4 (JC, one category) reaches the paired kernel through
        zero-proportion category padding (BASELINE config 1 no longer
        silently falls back to the scan tape): padded ingredients are an
        exact no-op and full LL+gradient parity holds."""
        coll = parse_nexus_file(str(data_dir / "DS1.subsampled_10.t"))
        seqs = read_fasta(str(data_dir / "DS1.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        engine = TreeLikelihoodEngine(sp, PhyloModel(
            PhyloModelSpecification()))
        assert engine._use_paired()
        assert engine._padded_categories() == 4
        trees = coll.trees[:2]
        engine.kernel = "scan"
        ll_s, g_s = engine.ll_and_branch_gradients(trees, {})
        engine.kernel = "pallas_interpret"
        ll_p, g_p = engine.ll_and_branch_gradients(trees, {})
        np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_s),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_s),
                                   rtol=1e-3,
                                   atol=1e-4 * np.abs(np.asarray(g_s)).max())

    def test_odd_batch_keeps_interleave_via_padding(self, data_dir):
        """Round-3 hole (b): an odd tree batch silently dropped to G=1.
        The engine now pads odd batches to even (repeating the last tree)
        before the kernel, so the G-way interleave survives; outputs for
        the real trees must match the scan tape."""
        coll = parse_nexus_file(str(data_dir / "DS1.subsampled_10.t"))
        seqs = read_fasta(str(data_dir / "DS1.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        spec = PhyloModelSpecification(substitution="GTR", site="gamma+4")
        engine = TreeLikelihoodEngine(sp, PhyloModel(spec))
        trees = coll.trees[:3]  # odd
        engine.kernel = "pallas_interpret"
        padded, _, true_b = engine._pad_batch(trees, None)
        assert len(padded) == 4 and true_b == 3
        ll_p, g_p = engine.ll_and_branch_gradients(trees, params := _params())
        assert np.asarray(ll_p).shape == (3,)
        engine.kernel = "scan"
        ll_s, g_s = engine.ll_and_branch_gradients(trees, params)
        np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_s),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_s),
                                   rtol=5e-3,
                                   atol=5e-4 * np.abs(np.asarray(g_s)).max())
