"""GP engine parity tests.

Oracles (reference src/gp_doctest.cpp):
  - hello per-PCSP LLs and marginal == -84.77961943 (line 119)
  - composite marginal == brute-force exact marginal over all DAG topologies
    (TestCompositeMarginal, lines 236-256), before and after branch
    optimization, with per-PCSP component comparison
  - SBN rootsplit posterior on five taxa (line 477)
  - uniform/topological-support/inverted priors (lines 558-650)
"""
import numpy as np
import pytest

from bito_tpu.api.gp import gp_instance
from bito_tpu.core.newick import parse_newick_text, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.core.tree import Tree, TreeCollection
from bito_tpu.models.phylo_model import PhyloModel, PhyloModelSpecification
from bito_tpu.treelike.engine import TreeLikelihoodEngine


def make_gp(fasta, newick, data_dir):
    inst = gp_instance()
    inst.read_fasta_file(str(data_dir / fasta))
    inst.read_newick_file(str(data_dir / newick))
    inst.make_gp_engine()
    return inst


def compute_exact_marginal(tree_collection, fasta_path, dag):
    """Reference ComputeExactMarginal (src/gp_doctest.cpp:150-215): exact
    per-site marginal over the given complete tree set under a uniform
    1/tree_count prior, plus per-edge (PCSP) log marginals."""
    seqs = read_fasta(fasta_path)
    sp = SitePattern(seqs, tree_collection.taxon_names)
    model = PhyloModel(PhyloModelSpecification())
    engine = TreeLikelihoodEngine(sp, model)
    trees = tree_collection.trees
    # Per-(tree, pattern) log likelihoods via the single-tree engine.
    from bito_tpu.treelike import pruning

    enc = engine.encode(trees)
    bl = engine.branch_length_matrix(trees, enc)
    eig, rates, props, clock = engine._model_ingredients({}, len(trees))
    import jax.numpy as jnp

    P = pruning.transition_matrices_ext(eig, bl, rates, clock)
    buf, logs = pruning.init_partials(
        engine.tip_partials, len(trees), enc.num_slots, 1, engine.pattern_pad
    )
    buf, logs = pruning.postorder_pass(jnp.asarray(enc.post_ops), P, buf, logs)
    per_pattern = pruning.root_log_likelihood(
        buf, logs, jnp.asarray(enc.root), eig.pi, props
    )
    per_pattern = np.asarray(per_pattern)[:, : sp.pattern_count]  # [T, S]
    log_prior = -np.log(len(trees))
    # Exact per-site marginal.
    from scipy.special import logsumexp

    per_site_marginal = logsumexp(per_pattern, axis=0) + log_prior
    weights = sp.weights
    exact_marginal = float(per_site_marginal @ weights)
    # Per-edge: logsumexp over trees containing each edge, per site.
    E = dag.edge_count()
    per_edge = {}
    reps = [
        dag.indexer_representation_of_topology(t.topology) for t in trees
    ]
    for e in range(E):
        members = [i for i, rep in enumerate(reps) if e in rep]
        if not members:
            continue
        v = logsumexp(per_pattern[members], axis=0) + log_prior
        per_edge[e] = float(v @ weights)
    return exact_marginal, per_edge


class TestHelloGP:
    def test_straightforward_likelihood(self, data_dir):
        inst = make_gp("hello.fasta", "hello_rooted.nwk", data_dir)
        inst.set_branch_lengths(np.array([0.1, 0.15, 0.22, 0.113, 0.0]))
        inst.populate_plvs()
        inst.compute_likelihoods()
        golden = -84.77961943
        assert abs(inst.get_log_marginal_likelihood() - golden) < 1e-6
        np.testing.assert_allclose(
            inst.get_per_gpcsp_log_likelihoods(), golden, atol=1e-6
        )


def check_composite_marginal(inst, fasta_path, optimize=True, tol=1e-6):
    if optimize:
        inst.estimate_branch_lengths(1e-5, 100, quiet=True)
    inst.populate_plvs()
    inst.compute_likelihoods()
    gp_marginal = inst.get_log_marginal_likelihood()
    complete = inst.generate_complete_rooted_tree_collection()
    exact_marginal, exact_per_edge = compute_exact_marginal(
        complete, fasta_path, inst.get_dag()
    )
    assert abs(gp_marginal - exact_marginal) < tol, (
        gp_marginal, exact_marginal
    )
    gp_components = (
        inst.get_gp_engine().per_gpcsp_components_of_full_log_marginal()
    )
    for e, exact_val in exact_per_edge.items():
        assert abs(gp_components[e] - exact_val) < max(tol, 1e-5), (
            e, inst.get_dag().pretty_edge(e), gp_components[e], exact_val
        )


class TestCompositeMarginal:
    def test_hello_two_trees(self, data_dir):
        inst = make_gp("hello.fasta", "hello_rooted_two_trees.nwk", data_dir)
        check_composite_marginal(
            inst, str(data_dir / "hello.fasta"), optimize=False, tol=1e-10
        )
        check_composite_marginal(inst, str(data_dir / "hello.fasta"))

    def test_five_taxon(self, data_dir):
        inst = make_gp("five_taxon.fasta", "five_taxon_rooted.nwk", data_dir)
        check_composite_marginal(
            inst, str(data_dir / "five_taxon.fasta"), optimize=False,
            tol=1e-10,
        )
        check_composite_marginal(inst, str(data_dir / "five_taxon.fasta"))

    def test_ds1_reduced_5(self, data_dir):
        inst = make_gp("ds1-reduced-5.fasta", "ds1-reduced-5.nwk", data_dir)
        check_composite_marginal(inst, str(data_dir / "ds1-reduced-5.fasta"))


class TestSBNEstimation:
    def test_rootsplit_posterior_five_taxa(self, data_dir):
        """Reference gp_doctest:477: rootsplit per-PCSP LLs equal exact
        marginals of the trees sharing each rootsplit; EstimateSBNParameters
        gives the posterior over rootsplits."""
        inst = make_gp("five_taxon.fasta", "five_taxon_rooted.nwk", data_dir)
        eng = inst.get_gp_engine()
        import jax.numpy as jnp

        eng.branch_lengths = jnp.full_like(eng.branch_lengths, 0.1)
        inst.populate_plvs()
        inst.compute_likelihoods()
        dag = inst.get_dag()
        ll = inst.get_per_gpcsp_log_likelihoods()
        # Rootsplit edges and their expected exact values.
        from scipy.special import logsumexp

        complete = inst.generate_complete_rooted_tree_collection()
        # group complete trees by rootsplit edge
        reps = [
            dag.indexer_representation_of_topology(t.topology)
            for t in complete.trees
        ]
        root_edges = sorted(
            {dag.edge_to_id[(dag.root_id, r)] for r in dag.rootsplit_ids()}
        )
        exact_marginal, exact_per_edge = compute_exact_marginal(
            complete, str(data_dir / "five_taxon.fasta"), dag
        )
        # Reference: the conditional per-edge LL at a rootsplit edge equals
        # sum_k log( sum_{tau containing rs} q(tau) P(y_k|tau) / q(rs) ).
        # The exact oracle's per-edge values use the uniform 1/n_trees
        # prior == q(tau) here (uniform-on-support); the division by q(rs)
        # applies per site, hence the site-count multiplier.
        site_count = float(
            inst.get_gp_engine().site_pattern.weights.sum()
        )
        prior = np.asarray(eng.q)
        for e in root_edges:
            expected = exact_per_edge[e] - site_count * np.log(prior[e])
            assert abs(ll[e] - expected) < 1e-6, (e, ll[e], expected)
        # SBN estimation: posterior over rootsplits proportional to
        # conditional LL + log prior.
        inst.estimate_sbn_parameters()
        q = inst.get_sbn_parameters()
        logits = np.array([
            exact_per_edge[e] - site_count * np.log(prior[e])
            + np.log(prior[e])
            for e in root_edges
        ])
        logits -= logsumexp(logits)
        np.testing.assert_allclose(
            q[root_edges], np.exp(logits), atol=1e-6
        )


class TestPriors:
    def test_uniform_priors_four_taxa(self, data_dir):
        inst = gp_instance()
        inst.read_fasta_file(str(data_dir / "four-numbered-taxa.fasta"))
        inst.read_newick_file(
            str(data_dir / "four-taxon-two-tree-rootsplit-uncertainty.nwk")
        )
        inst.make_dag()
        dag = inst.get_dag()
        support = dag.build_uniform_on_topological_support_prior()
        all_prior = dag.build_uniform_on_all_topologies_prior()
        pretty = dag.pretty_edges()
        by_pretty_support = dict(zip(pretty, support))
        by_pretty_all = dict(zip(pretty, all_prior))
        assert abs(by_pretty_support["0000|1111|0001"] - 2 / 3) < 1e-10
        assert abs(by_pretty_support["0000|1111|0011"] - 1 / 3) < 1e-10
        assert abs(by_pretty_support["0001|1110|0110"] - 1 / 2) < 1e-10
        assert abs(by_pretty_support["0001|1110|0010"] - 1 / 2) < 1e-10
        assert abs(by_pretty_all["0000|1111|0001"] - 3 / 15) < 1e-10
        assert abs(by_pretty_all["0000|1111|0011"] - 1 / 15) < 1e-10
        assert abs(by_pretty_all["0001|1110|0110"] - 1 / 3) < 1e-10
        assert abs(by_pretty_all["0001|1110|0010"] - 1 / 3) < 1e-10

    def test_unconditional_and_inverted_probabilities(self, data_dir):
        """Structure-level checks of UnconditionalNodeProbabilities and
        InvertedGPCSPProbabilities on five_taxon_rooted_more_2.nwk
        (values from reference gp_doctest:588-650, compared as multisets
        because node/edge numbering differs)."""
        inst = gp_instance()
        inst.read_fasta_file(str(data_dir / "five_taxon.fasta"))
        inst.read_newick_file(str(data_dir / "five_taxon_rooted_more_2.nwk"))
        inst.make_dag()
        dag = inst.get_dag()
        q = dag.build_uniform_on_topological_support_prior()
        node_probs = dag.unconditional_node_probabilities(q)
        assert sorted(np.round(node_probs, 10).tolist()) == sorted(
            [1.0] * 5 + [0.75, 0.5, 0.25, 0.25, 0.5, 0.25, 0.25, 0.5, 0.5,
                         0.25, 1.0]
        )
        inv = dag.inverted_gpcsp_probabilities(q, node_probs)
        expected = sorted(
            [1.0, 1.0, 1.0, 1.0, 1.0, 2 / 3, 0.5, 0.5, 0.5, 1.0, 1.0, 0.5,
             1 / 3, 0.5, 0.5, 0.5, 0.5, 0.25, 0.5, 0.25, 0.25, 0.75, 0.75,
             0.25]
        )
        assert sorted(np.round(inv, 10).tolist()) == [
            round(v, 10) for v in expected
        ]


class TestHotStart:
    def test_take_first_and_hot_start(self, data_dir):
        inst = make_gp("hello.fasta", "hello_rooted.nwk", data_dir)
        inst.take_first_branch_length()
        bl = inst.get_branch_lengths()
        # The loaded tree's branch lengths should appear on its edges.
        tree = inst.tree_collection.trees[0]
        assert set(np.round(tree.branch_lengths[:-1], 8)) <= set(
            np.round(bl, 8)
        )
        inst.hot_start_branch_lengths()
        np.testing.assert_allclose(inst.get_branch_lengths(), bl)


class TestDAGStructure:
    def test_summary_statistics(self, data_dir):
        inst = make_gp("hello.fasta", "hello_rooted.nwk", data_dir)
        stats = inst.dag_summary_statistics()
        assert stats["taxon_count"] == 3
        assert stats["topology_count"] == 1
        assert stats["edge_count"] == 5

    def test_generate_all_topologies_count(self, data_dir):
        inst = gp_instance()
        inst.read_fasta_file(str(data_dir / "five_taxon.fasta"))
        inst.read_newick_file(str(data_dir / "five_taxon_rooted.nwk"))
        inst.make_dag()
        dag = inst.get_dag()
        topologies = dag.generate_all_topologies()
        assert len(topologies) == int(dag.topology_count())
        # Every generated topology must be contained in the DAG.
        for topo in topologies:
            assert dag.contains_topology(topo)


class TestFluARescaling:
    """Deep-tree numerics (reference gp_doctest "Rescaling" on fluA,
    src/gp_doctest.cpp:348-359): the reference checks its counted
    rescaling is threshold-invariant; here rescaling is exact per-site
    log bookkeeping, so the oracle is stronger — the 69-taxon fluA GP
    marginal must equal the classical single-tree log likelihood."""

    def test_flua_gp_marginal_matches_classical(self, data_dir):
        inst = make_gp("fluA.fa", "fluA.tree", data_dir)
        eng = inst.get_gp_engine()
        n_edges = inst.get_dag().edge_count()
        inst.set_branch_lengths(np.full(n_edges, 0.01))
        inst.populate_plvs()
        inst.compute_likelihoods()
        gp_marginal = inst.get_log_marginal_likelihood()
        assert np.isfinite(gp_marginal)

        seqs = read_fasta(str(data_dir / "fluA.fa"))
        coll = parse_newick_text(open(data_dir / "fluA.tree").read())
        tree = coll.trees[0]
        tree.branch_lengths[:] = 0.01
        sp = SitePattern(seqs, coll.taxon_names)
        engine = TreeLikelihoodEngine(
            sp, PhyloModel(PhyloModelSpecification()))
        ll = float(np.asarray(engine.log_likelihoods([tree], {}))[0])
        assert abs(gp_marginal - ll) < 1e-6, (gp_marginal, ll)


class TestOptimizationMethods:
    """The optimization-method switch must change the compute path while
    converging to the same optima (reference Optimization suite,
    src/optimization.hpp:13-402, wired via GPEngine::SetOptimizationMethod,
    src/gp_engine.cpp:656-664)."""

    def _optimize_with(self, data_dir, method, sweeps=40):
        inst = make_gp("hello.fasta", "hello_rooted.nwk", data_dir)
        inst.set_optimization_method(method)
        assert inst.get_gp_engine().optimization_method == method
        inst.estimate_branch_lengths(1e-6, sweeps, quiet=True)
        inst.populate_plvs()
        inst.compute_likelihoods()
        return (inst.get_log_marginal_likelihood(),
                np.asarray(inst.get_gp_engine().branch_lengths))

    def test_methods_agree_on_optima(self, data_dir):
        marg_brent, bl_brent = self._optimize_with(data_dir, "brent")
        for method in ("brent_with_gradients", "newton"):
            marg, bl = self._optimize_with(data_dir, method)
            assert abs(marg - marg_brent) < 1e-4, (method, marg, marg_brent)
            np.testing.assert_allclose(bl, bl_brent, atol=2e-3,
                                       err_msg=method)

    def test_gradient_ascent_improves(self, data_dir):
        # The fixed-step ascent methods carry the reference's constants
        # (step 5e-4 / log-space 1.0005, src/dag_branch_handler.hpp:291-292)
        # and are not guaranteed to reach the Brent optimum; assert they
        # run on their own compute path and improve the initial marginal.
        inst = make_gp("hello.fasta", "hello_rooted.nwk", data_dir)
        inst.populate_plvs()
        inst.compute_likelihoods()
        start = inst.get_log_marginal_likelihood()
        inst.set_optimization_method("gradient_ascent")
        inst.estimate_branch_lengths(1e-6, 5, quiet=True)
        inst.populate_plvs()
        inst.compute_likelihoods()
        assert inst.get_log_marginal_likelihood() > start

    def test_use_gradient_optimization_switches_path(self, data_dir):
        inst = make_gp("hello.fasta", "hello_rooted.nwk", data_dir)
        assert inst.get_gp_engine().optimization_method == "brent"
        inst.use_gradient_optimization(True)
        assert (inst.get_gp_engine().optimization_method
                == "brent_with_gradients")
        inst.use_gradient_optimization(False)
        assert inst.get_gp_engine().optimization_method == "brent"

    def test_set_rescaling_refuses_off(self, data_dir):
        inst = make_gp("hello.fasta", "hello_rooted.nwk", data_dir)
        inst.set_rescaling(True)  # always-on: accepting True is exact
        with pytest.raises(NotImplementedError):
            inst.set_rescaling(False)


class TestFusedEstimateLoop:
    def test_fused_while_loop_matches_host_loop(self):
        """estimate_branch_lengths' quiet path (one jitted lax.while_loop,
        round 5) must match the host loop (the verbose path) exactly:
        same marginal, same branch lengths, same convergence."""
        import numpy as np
        from bito_tpu.api.gp import gp_instance

        def run(quiet):
            inst = gp_instance("")
            inst.read_fasta_file("/root/reference/data/five_taxon.fasta")
            inst.read_newick_file(
                "/root/reference/data/five_taxon_rooted.nwk")
            inst.make_dag()
            inst.make_gp_engine()
            eng = inst.get_gp_engine()
            import contextlib, io

            with contextlib.redirect_stdout(io.StringIO()):
                marg = eng.estimate_branch_lengths(1e-4, 50, quiet=quiet)
            return marg, np.asarray(eng.branch_lengths).copy()

        m_fused, bl_fused = run(True)
        m_host, bl_host = run(False)
        assert abs(m_fused - m_host) < 1e-10, (m_fused, m_host)
        np.testing.assert_allclose(bl_fused, bl_host, rtol=0, atol=1e-12)
