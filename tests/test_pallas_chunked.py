"""Chunked level-synchronous Pallas kernel (treelike/pallas_chunked.py)
parity tests.

Interpret-mode on CPU against the f64 scan tape; real-TPU parity is guarded
by bench.py's kernel-vs-kernel check on every bench run.
"""
import numpy as np
import pytest

from bito_tpu.core.newick import (
    parse_newick_file,
    parse_nexus_file,
    read_fasta,
)
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.models.phylo_model import PhyloModel, PhyloModelSpecification
from bito_tpu.treelike.engine import TreeLikelihoodEngine
from bito_tpu.treelike import pallas_chunked, pallas_pruning


def _params():
    import jax.numpy as jnp

    return {
        "substitution_model_rates": jnp.asarray(
            [0.1, 0.3, 0.1, 0.2, 0.25, 0.05]),
        "substitution_model_frequencies": jnp.asarray([0.3, 0.25, 0.2, 0.25]),
        "site_model_parameters": jnp.asarray([0.5]),
    }


def _run_chunked(engine, trees, params, group, W=4):
    import jax.numpy as jnp

    enc = engine.encode(trees)
    bl = engine.branch_length_matrix(trees, enc)
    eig, rates, props, clock = engine._model_ingredients(params, len(trees))
    sp = engine.site_pattern
    P_blk, dP_blk, tips_flat, pivec, propvec, w = (
        pallas_pruning.prepare_inputs_grad(
            enc, jnp.asarray(sp.tip_partials(), jnp.float32), sp.weights,
            eig, rates, props, clock, bl, engine.pattern_pad))
    ce = pallas_chunked.build_chunked_encoding(enc, W=W)
    CA = pivec.shape[1]
    ll, grads = pallas_chunked.chunked_ll_and_gradients(
        jnp.asarray(ce.post_dst), jnp.asarray(ce.tip_slot),
        jnp.asarray(ce.post_e), jnp.asarray(ce.node_row),
        jnp.asarray(enc.edge_mask, jnp.float32),
        P_blk, dP_blk, tips_flat, pivec, propvec, w,
        Mc=ce.Mc, W=ce.W, T=ce.num_taxa, CA=CA, num_slots=enc.num_slots,
        s_tile=engine._pallas_s_tile(), group=group, interpret=True)
    llo = pallas_chunked.chunked_log_likelihoods(
        jnp.asarray(ce.post_dst), jnp.asarray(ce.tip_slot), P_blk,
        jnp.asarray(ce.post_e), tips_flat, pivec * propvec, w,
        Mc=ce.Mc, W=ce.W, T=ce.num_taxa, CA=CA,
        s_tile=engine._pallas_s_tile(), group=group, interpret=True)
    return np.asarray(ll), np.asarray(grads), np.asarray(llo)


def _check(engine, trees, params, group, W=4):
    engine.kernel = "scan"
    ll_ref, g_ref = engine.ll_and_branch_gradients(trees, params)
    ll_ref, g_ref = np.asarray(ll_ref), np.asarray(g_ref)
    ll, grads, llo = _run_chunked(engine, trees, params, group, W=W)
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-5)
    np.testing.assert_allclose(llo, ll_ref, rtol=1e-5)
    np.testing.assert_allclose(grads[:, :g_ref.shape[1]], g_ref, rtol=1e-3,
                               atol=1e-4 * np.abs(g_ref).max())


class TestChunkedKernel:
    @pytest.mark.parametrize("group", [1, 2])
    def test_ds1_unrooted_parity(self, data_dir, group):
        """Trifurcating-root DS1 trees: LL + gradients vs the scan tape,
        with and without tree interleaving."""
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

    def test_schedule_is_dependency_safe(self, data_dir):
        """No op may consume a value produced in its own chunk, and every
        real op's destination must lie in a strictly later chunk."""
        coll = parse_nexus_file(str(data_dir / "DS1.subsampled_10.t"))
        from bito_tpu.treelike.encode import encode_trees

        enc = encode_trees([t.topology for t in coll.trees[:10]])
        ce = pallas_chunked.build_chunked_encoding(enc, W=4)
        W, MW = ce.W, ce.MW
        for b in range(10):
            for g in range(MW):
                dst = int(ce.post_dst[b, g])
                if dst >= 2 * MW:      # trash/root
                    continue
                # destination grid position must be in a later chunk
                assert (dst // 2) // W > g // W, (b, g, dst)


class TestEngineChunkedRouting:
    def test_engine_kernel_chunked_interpret_routes_and_matches(
            self, data_dir):
        """kernel='chunked_interpret' must actually dispatch the chunked
        kernel through the engine (advisor round-4 medium finding: the
        opt-in was unreachable — _use_pallas() returned False for it and
        the scan tape silently ran) and match the scan tape on both the
        LL and LL+gradient product entry points."""
        coll = parse_nexus_file(str(data_dir / "DS1.subsampled_10.t"))
        seqs = read_fasta(str(data_dir / "DS1.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        spec = PhyloModelSpecification(substitution="GTR", site="gamma+4")
        engine = TreeLikelihoodEngine(sp, PhyloModel(spec))
        trees = coll.trees[:4]
        params = _params()

        engine.kernel = "chunked_interpret"
        assert engine._use_pallas(True) and engine._use_chunked()
        ll_c = np.asarray(engine.log_likelihoods(trees, params))
        ll_cg, g_c = engine.ll_and_branch_gradients(trees, params)

        engine.kernel = "scan"
        ll_s = np.asarray(engine.log_likelihoods(trees, params))
        _, g_s = engine.ll_and_branch_gradients(trees, params)

        np.testing.assert_allclose(ll_c, ll_s, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ll_cg), ll_s, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_c), np.asarray(g_s), rtol=1e-3,
            atol=1e-4 * np.abs(np.asarray(g_s)).max())

    def test_ll_eval_fn_serves_engine_dispatch(self, data_dir):
        """ll_eval_fn (the LL-only sweep closure bench config1 drives)
        matches log_likelihoods through the same kernel selection."""
        import jax
        import jax.numpy as jnp

        coll = parse_nexus_file(str(data_dir / "DS1.subsampled_10.t"))
        seqs = read_fasta(str(data_dir / "DS1.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        engine = TreeLikelihoodEngine(sp, PhyloModel(
            PhyloModelSpecification()))
        trees = coll.trees[:3]  # odd batch exercises the pad path
        enc = engine.encode(trees + trees[-1:])
        bl = engine.branch_length_matrix(trees + trees[-1:], enc)[:3]
        fn = engine.ll_eval_fn(trees, {})
        ll_fn = np.asarray(jax.jit(fn)(bl))
        ll_direct = np.asarray(engine.log_likelihoods(trees, {}))
        np.testing.assert_allclose(ll_fn, ll_direct, rtol=1e-6)
