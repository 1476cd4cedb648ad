"""Single-tree likelihood parity tests.

Oracles (reference):
  - hello JC69 LL == -84.852358 (src/unrooted_sbn_instance.hpp:243)
  - DS1 10-tree JC69 LLs == pybeagle goldens
    (src/unrooted_sbn_instance.hpp:252-257)
  - brute-force enumeration over internal states on tiny trees
  - finite-difference checks of branch gradients
"""
import itertools

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

PYBEAGLE_DS1_LLS = [
    -14582.995273982739, -6911.294207416366, -6916.880235529542,
    -6904.016888831189, -6915.055570693576, -6915.50496696512,
    -6910.958836661867, -6909.02639968063, -6912.967861935749,
    -6910.7871105783515,
]


def make_engine(fasta, trees_file, spec=None, nexus=False, data_dir=None):
    if nexus:
        coll = parse_nexus_file(str(data_dir / trees_file))
    else:
        coll = parse_newick_file(str(data_dir / trees_file))
    seqs = read_fasta(str(data_dir / fasta))
    sp = SitePattern(seqs, coll.taxon_names)
    model = PhyloModel(spec or PhyloModelSpecification())
    return coll, TreeLikelihoodEngine(sp, model), model


def brute_force_ll(tree, tip_states, Q_eig, pi, cat_rates, cat_props, weights):
    """Enumerate internal-node states: exact likelihood for tiny trees."""
    from bito_tpu.models.substitution import transition_matrices
    import jax.numpy as jnp

    topo = tree.topology
    n = topo.num_taxa
    N = topo.num_nodes
    parents = topo.parents
    S = tip_states.shape[1]
    total = 0.0
    lls = np.zeros(S)
    for s in range(S):
        site_l = 0.0
        for c, rate in enumerate(cat_rates):
            P = {
                u: np.asarray(
                    transition_matrices(Q_eig, jnp.asarray(tree.branch_lengths[u] * rate))
                )
                for u in range(N - 1)
            }
            acc = 0.0
            internals = list(range(n, N))
            for assign in itertools.product(range(4), repeat=len(internals)):
                state = {internals[i]: assign[i] for i in range(len(internals))}
                for t_ in range(n):
                    state[t_] = tip_states[t_, s]
                prob = pi[state[N - 1]]
                for u in range(N - 1):
                    su = state[u]
                    sp_ = state[parents[u]]
                    if su == 4:  # gap: sum over states = 1 contribution per row
                        prob *= 1.0
                    else:
                        prob *= P[u][sp_, su]
                acc += prob
            site_l += cat_props[c] * acc
        lls[s] = np.log(site_l)
    return float(lls @ weights), lls


class TestHello:
    def test_hello_likelihood_parity(self, data_dir):
        coll, engine, model = make_engine(
            "hello.fasta", "hello.nwk", data_dir=data_dir
        )
        ll = np.asarray(engine.log_likelihoods(coll.trees, {}))
        assert ll.shape == (1,)
        assert abs(ll[0] - -84.852358) < 1e-6

    def test_hello_vs_brute_force(self, data_dir):
        from bito_tpu.models.substitution import jc69_eigen

        coll, engine, model = make_engine(
            "hello.fasta", "hello.nwk", data_dir=data_dir
        )
        sp = engine.site_pattern
        eig = jc69_eigen()
        expected, _ = brute_force_ll(
            coll.trees[0], sp.tip_states(), eig, np.full(4, 0.25),
            [1.0], [1.0], sp.weights,
        )
        got = float(np.asarray(engine.log_likelihoods(coll.trees, {}))[0])
        assert abs(got - expected) < 1e-9


class TestDS1:
    def test_ds1_jc69_parity_with_pybeagle(self, data_dir):
        coll, engine, model = make_engine(
            "DS1.fasta", "DS1.subsampled_10.t", nexus=True, data_dir=data_dir
        )
        assert len(coll.trees) == 10
        ll = np.asarray(engine.log_likelihoods(coll.trees, {}))
        np.testing.assert_allclose(ll, PYBEAGLE_DS1_LLS, rtol=0, atol=2e-6)

    def test_ds1_jc69_equals_gtr_at_jc_params(self, data_dir):
        import jax.numpy as jnp

        coll, engine_jc, _ = make_engine(
            "DS1.fasta", "DS1.subsampled_10.t", nexus=True, data_dir=data_dir
        )
        trees = coll.trees[:3]
        ll_jc = np.asarray(engine_jc.log_likelihoods(trees, {}))
        spec = PhyloModelSpecification(substitution="GTR")
        coll2, engine_gtr, model_gtr = make_engine(
            "DS1.fasta", "DS1.subsampled_10.t", spec=spec, nexus=True,
            data_dir=data_dir,
        )
        params = {
            "substitution_model_rates": jnp.full((6,), 1 / 6),
            "substitution_model_frequencies": jnp.full((4,), 0.25),
        }
        ll_gtr = np.asarray(engine_gtr.log_likelihoods(trees, params))
        np.testing.assert_allclose(ll_jc, ll_gtr, atol=1e-8)


class TestGradients:
    @pytest.mark.parametrize("subst", ["JC69", "GTR"])
    @pytest.mark.parametrize("site", ["constant", "weibull+4"])
    def test_branch_gradients_vs_finite_differences(self, data_dir, subst, site):
        import jax.numpy as jnp

        spec = PhyloModelSpecification(substitution=subst, site=site)
        coll, engine, model = make_engine(
            "five_taxon.fasta", "five_taxon_unrooted.nwk", spec=spec,
            data_dir=data_dir,
        )
        trees = coll.trees[:2]
        for t in trees:
            rng = np.random.RandomState(hash(subst + site) % 2**31)
            t.branch_lengths[:-1] = 0.05 + 0.2 * rng.rand(len(t.branch_lengths) - 1)
        params = {}
        if subst == "GTR":
            params["substitution_model_rates"] = jnp.asarray(
                [0.1, 0.3, 0.1, 0.2, 0.25, 0.05]
            )
            params["substitution_model_frequencies"] = jnp.asarray(
                [0.3, 0.25, 0.2, 0.25]
            )
        if site == "weibull+4":
            params["site_model_parameters"] = jnp.asarray([0.7])
        ll, grads = engine.ll_and_branch_gradients(trees, params)
        ll = np.asarray(ll)
        grads = np.asarray(grads)
        eps = 1e-6
        for b, t in enumerate(trees):
            for u in range(t.topology.num_nodes - 1):
                t.branch_lengths[u] += eps
                lp = float(np.asarray(engine.log_likelihoods(trees, params))[b])
                t.branch_lengths[u] -= 2 * eps
                lm = float(np.asarray(engine.log_likelihoods(trees, params))[b])
                t.branch_lengths[u] += eps
                fd = (lp - lm) / (2 * eps)
                assert abs(grads[b, u] - fd) < 1e-4, (b, u, grads[b, u], fd)


class TestSitePattern:
    def test_compression_weights_sum_to_length(self, data_dir):
        seqs = read_fasta(str(data_dir / "DS1.fasta"))
        names = list(seqs.keys())
        sp = SitePattern(seqs, names)
        assert sp.weights.sum() == len(next(iter(seqs.values())))
        assert sp.patterns.shape[0] == len(names)

    def test_hello_patterns(self, data_dir):
        seqs = read_fasta(str(data_dir / "hello.fasta"))
        sp = SitePattern(seqs, list(seqs.keys()))
        assert sp.weights.sum() == 31


class TestNewick:
    def test_roundtrip_five_taxon(self, data_dir):
        coll = parse_newick_file(str(data_dir / "five_taxon_unrooted.nwk"))
        assert len(coll.trees) == 4
        assert coll.num_taxa == 5
        # Round trip: newick out, parse again, same topology keys.
        text = coll.newick()
        from bito_tpu.core.newick import parse_newick_text

        coll2 = parse_newick_text(text, taxon_names=coll.taxon_names)
        for a, b in zip(coll.trees, coll2.trees):
            assert a.topology.key() == b.topology.key()
            np.testing.assert_allclose(a.branch_lengths, b.branch_lengths)

    def test_nexus_translate(self, data_dir):
        coll = parse_nexus_file(str(data_dir / "DS1.subsampled_10.t"))
        assert coll.num_taxa == 27
        assert coll.taxon_names[0] == "Alligator_mississippiensis"
        assert len(coll.trees) == 10


class TestPallasKernel:
    def test_pallas_matches_scan_path(self, data_dir):
        """The VMEM-resident Pallas postorder kernel (interpret mode on CPU)
        agrees with the scan tape."""
        import jax.numpy as jnp

        from bito_tpu.treelike import pallas_pruning

        spec = PhyloModelSpecification(substitution="GTR", site="gamma+4")
        coll, engine, model = make_engine(
            "DS1.fasta", "DS1.subsampled_10.t", spec=spec, nexus=True,
            data_dir=data_dir,
        )
        trees = coll.trees[:3]
        params = {
            "substitution_model_rates": jnp.asarray(
                [0.1, 0.3, 0.1, 0.2, 0.25, 0.05]
            ),
            "substitution_model_frequencies": jnp.asarray(
                [0.3, 0.25, 0.2, 0.25]
            ),
            "site_model_parameters": jnp.asarray([0.5]),
        }
        ll_ref = np.asarray(engine.log_likelihoods(trees, params))
        enc = engine.encode(trees)
        bl = engine.branch_length_matrix(trees, enc)
        eig, rates, props, clock = engine._model_ingredients(
            params, len(trees)
        )
        sp = engine.site_pattern
        P_blk, tips_flat, piprop, w = pallas_pruning.prepare_inputs(
            enc, jnp.asarray(sp.tip_partials(), jnp.float32), sp.weights,
            eig, rates, props, clock, bl, engine.pattern_pad,
        )
        ll_pl = np.asarray(pallas_pruning.pallas_log_likelihoods(
            jnp.asarray(enc.post_ops), jnp.asarray(enc.root), P_blk,
            tips_flat, piprop, w, num_slots=enc.num_slots,
            category_count=4, s_tile=512, interpret=True,
        ))
        # float32 kernel vs float64 reference: relative agreement.
        np.testing.assert_allclose(ll_pl, ll_ref, rtol=1e-6)

    def test_pallas_gradients_match_scan_path(self, data_dir):
        """The fused LL+gradient kernel (interpret mode on CPU) agrees with
        the scan-tape preorder gradients."""
        import jax.numpy as jnp

        from bito_tpu.treelike import pallas_pruning

        spec = PhyloModelSpecification(substitution="GTR", site="gamma+4")
        coll, engine, model = make_engine(
            "DS1.fasta", "DS1.subsampled_10.t", spec=spec, nexus=True,
            data_dir=data_dir,
        )
        trees = coll.trees[:3]
        params = {
            "substitution_model_rates": jnp.asarray(
                [0.1, 0.3, 0.1, 0.2, 0.25, 0.05]
            ),
            "substitution_model_frequencies": jnp.asarray(
                [0.3, 0.25, 0.2, 0.25]
            ),
            "site_model_parameters": jnp.asarray([0.5]),
        }
        ll_ref, grads_ref = engine.ll_and_branch_gradients(trees, params)
        ll_ref, grads_ref = np.asarray(ll_ref), np.asarray(grads_ref)
        enc = engine.encode(trees)
        bl = engine.branch_length_matrix(trees, enc)
        eig, rates, props, clock = engine._model_ingredients(
            params, len(trees)
        )
        sp = engine.site_pattern
        P_blk, dP_blk, tips_flat, pivec, propvec, w = (
            pallas_pruning.prepare_inputs_grad(
                enc, jnp.asarray(sp.tip_partials(), jnp.float32), sp.weights,
                eig, rates, props, clock, bl, engine.pattern_pad,
            )
        )
        ll_pl, grads_pl = pallas_pruning.pallas_ll_and_gradients(
            jnp.asarray(enc.post_ops), jnp.asarray(enc.pre_ops),
            jnp.asarray(enc.root),
            jnp.asarray(enc.edge_mask, jnp.float32), P_blk, dP_blk,
            tips_flat, pivec, propvec, w, num_slots=enc.num_slots,
            category_count=4, s_tile=512, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(ll_pl), ll_ref, rtol=1e-6)
        # f32 kernel vs f64 scan path: gradients are O(1e2-1e4).
        np.testing.assert_allclose(np.asarray(grads_pl), grads_ref,
                                   rtol=5e-4, atol=5e-3)


class TestEnginePallasPath:
    """The product engine must serve the Pallas kernel (VERDICT: the
    reference's hot path IS its engine, src/fat_beagle.cpp:49-169).  On CPU
    the kernel runs in interpret mode; real-TPU parity is guarded in
    bench.py on every bench run."""

    def test_engine_pallas_kernel_matches_scan(self, data_dir):
        import jax.numpy as jnp
        from bito_tpu.core.newick import parse_nexus_file, read_fasta
        from bito_tpu.core.site_pattern import SitePattern
        from bito_tpu.models.phylo_model import (
            PhyloModel, PhyloModelSpecification)
        from bito_tpu.treelike.engine import TreeLikelihoodEngine

        coll = parse_nexus_file(str(data_dir / "DS1.subsampled_10.t"))
        seqs = read_fasta(str(data_dir / "DS1.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        engine = TreeLikelihoodEngine(
            sp, PhyloModel(PhyloModelSpecification()), dtype=jnp.float32)
        trees = coll.trees[:3]
        ll_scan, g_scan = engine.ll_and_branch_gradients(trees, {})
        ll_scan2 = engine.log_likelihoods(trees, {})
        engine.kernel = "pallas_interpret"
        ll_pl, g_pl = engine.ll_and_branch_gradients(trees, {})
        ll_pl2 = engine.log_likelihoods(trees, {})
        rel = np.max(np.abs((np.asarray(ll_pl) - np.asarray(ll_scan))
                            / np.asarray(ll_scan)))
        assert rel < 1e-4, rel
        rel2 = np.max(np.abs((np.asarray(ll_pl2) - np.asarray(ll_scan2))
                             / np.asarray(ll_scan2)))
        assert rel2 < 1e-4, rel2
        gd = (np.max(np.abs(np.asarray(g_pl) - np.asarray(g_scan)))
              / np.max(np.abs(np.asarray(g_scan))))
        assert gd < 1e-4, gd

    def test_auto_gating(self, data_dir):
        import jax
        import jax.numpy as jnp
        from bito_tpu.core.newick import parse_newick_file, read_fasta
        from bito_tpu.core.site_pattern import SitePattern
        from bito_tpu.models.phylo_model import (
            PhyloModel, PhyloModelSpecification)
        from bito_tpu.treelike.engine import TreeLikelihoodEngine

        coll = parse_newick_file(str(data_dir / "hello.nwk"))
        seqs = read_fasta(str(data_dir / "hello.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        engine = TreeLikelihoodEngine(
            sp, PhyloModel(PhyloModelSpecification()))
        on_tpu = jax.default_backend() == "tpu"
        f32 = engine.dtype == jnp.float32
        # auto only engages the kernel on TPU in f32 with a shared model
        assert engine._use_pallas(True) == (on_tpu and f32)
        assert engine._use_pallas(False) is False or not on_tpu
        engine.kernel = "scan"
        assert not engine._use_pallas(True)
