"""NNI engine tests.

Oracles (reference src/gp_doctest.cpp NNIEngine cases):
  - 'Build Complete DAG by Adding NNIs' (line 1446): accepting every
    adjacent NNI reaches the complete DAG ((2n-3)!! rooted topologies)
  - adjacent-NNI maintenance: proposed pairs are valid and not in the DAG
  - likelihood-filtered search improves the best top-tree score
"""
import numpy as np
import pytest

from bito_tpu.core.bitset import PCSP
from bito_tpu.core.newick import parse_newick_file, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.dag.subsplit_dag import build_dag
from bito_tpu.nni.engine import NNIEngine, neighboring_nnis


def make_engine(newick, fasta, data_dir, scoring="tp_likelihood"):
    coll = parse_newick_file(str(data_dir / newick))
    seqs = read_fasta(str(data_dir / fasta))
    sp = SitePattern(seqs, coll.taxon_names)
    dag = build_dag(coll)
    return coll, NNIEngine(dag, sp, coll.trees, scoring=scoring)


class TestNNIOperation:
    def test_neighboring_nnis_are_valid_and_distinct(self, data_dir):
        coll, eng = make_engine(
            "four-taxon-two-tree-rootsplit-uncertainty.nwk",
            "four-numbered-taxa.fasta", data_dir,
        )
        dag = eng.dag
        for e in range(dag.edge_count()):
            p_id, c_id = int(dag.edge_parent[e]), int(dag.edge_child[e])
            if p_id == dag.root_id or c_id < dag.taxon_count:
                continue
            nnis = neighboring_nnis(dag.nodes[p_id], dag.nodes[c_id])
            assert len(nnis) == 2
            assert nnis[0].key() != nnis[1].key()
            for nni in nnis:
                # Valid parent/child pair: child splits a parent clade.
                PCSP.of_parent_child(nni.parent, nni.child)
                # Same leaf set as the original.
                assert nni.parent.union == dag.nodes[p_id].union


class TestCompleteDAG:
    def test_accept_all_reaches_complete_dag_four_taxa(self, data_dir):
        coll, eng = make_engine(
            "four-taxon-two-tree-rootsplit-uncertainty.nwk",
            "four-numbered-taxa.fasta", data_dir,
        )
        eng.set_filter_cutoff(-1e18)
        eng.run(max_iter=50)
        assert int(eng.dag.topology_count()) == 15  # (2*4-3)!!

    def test_accept_all_reaches_complete_dag_five_taxa(self, data_dir):
        coll, eng = make_engine(
            "five_taxon_rooted.nwk", "five_taxon.fasta", data_dir,
        )
        eng.set_filter_cutoff(-1e18)
        eng.run(max_iter=50)
        assert int(eng.dag.topology_count()) == 105  # (2*5-3)!!


class TestFilteredSearch:
    def test_top_k_search_improves_best_score(self, data_dir):
        coll, eng = make_engine(
            "ds1-reduced-5.nwk", "ds1-reduced-5.fasta", data_dir,
        )
        eng.tp.optimize_branch_lengths(tol=1e-4, max_iter=3)
        before = eng.tp.top_tree_log_likelihoods().max()
        eng.set_filter_top_k(1)
        iters = eng.run(max_iter=5)
        eng.tp.optimize_branch_lengths(tol=1e-4, max_iter=3)
        after = eng.tp.top_tree_log_likelihoods().max()
        assert after >= before - 1e-6
        assert len(eng.accepted) == iters

    def test_parsimony_search_runs(self, data_dir):
        coll, eng = make_engine(
            "ds1-reduced-5.nwk", "ds1-reduced-5.fasta", data_dir,
            scoring="tp_parsimony",
        )
        eng.set_filter_top_k(1)
        eng.run(max_iter=3)
        assert eng.iterations >= 1
        # Accepted NNIs entered the DAG.
        indexer = set(eng.dag.build_edge_indexer().keys())
        for nni in eng.accepted:
            assert PCSP.of_parent_child(
                nni.parent, nni.child
            ).to_string() in indexer


class TestGPScoring:
    def test_grafted_dag_is_valid_gp_dag(self, data_dir):
        """Grafting all adjacent NNIs yields a valid DAG whose GP marginal
        equals the exact marginal over its complete tree set (the same
        oracle as TestCompositeMarginal)."""
        from bito_tpu.dag.graft import graft_node_pairs
        from bito_tpu.gp.engine import GPEngine
        from bito_tpu.core.site_pattern import SitePattern
        from tests.test_gp import compute_exact_marginal

        coll = parse_newick_file(str(data_dir / "five_taxon_rooted.nwk"))
        seqs = read_fasta(str(data_dir / "five_taxon.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        dag = build_dag(coll)
        eng = NNIEngine(dag, sp, coll.trees)
        eng.sync_adjacent_nnis_with_dag()
        pairs = [(n.parent, n.child) for n in eng.adjacent.values()]
        assert pairs
        grafted, central = graft_node_pairs(dag, pairs)
        # Host edges all survive.
        host_keys = set(dag.build_edge_indexer().keys())
        graft_keys = set(grafted.build_edge_indexer().keys())
        assert host_keys <= graft_keys
        assert len(central) == len(pairs)
        gp = GPEngine(sp, grafted)
        gp.populate_plvs()
        gp.compute_likelihoods()
        from bito_tpu.api.gp import GPInstance

        inst = GPInstance()
        inst.tree_collection = coll
        inst.dag = grafted
        inst.engine = gp
        complete = inst.generate_complete_rooted_tree_collection()
        exact, _ = compute_exact_marginal(
            complete, str(data_dir / "five_taxon.fasta"), grafted
        )
        assert abs(gp.log_marginal_likelihood() - exact) < 1e-9

    def test_single_graft_matches_full_add(self, data_dir):
        """Proposed-NNI scores from a graft match the per-PCSP GP
        likelihoods after the NNI is permanently in the DAG (reference
        'Proposed NNI vs DAG NNI GPLikelihoods', gp_doctest:1937)."""
        from bito_tpu.dag.graft import graft_node_pairs
        from bito_tpu.gp.engine import GPEngine
        from bito_tpu.core.site_pattern import SitePattern

        coll = parse_newick_file(str(data_dir / "five_taxon_rooted.nwk"))
        seqs = read_fasta(str(data_dir / "five_taxon.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        dag = build_dag(coll)
        eng = NNIEngine(dag, sp, coll.trees)
        eng.sync_adjacent_nnis_with_dag()
        nnis = list(eng.adjacent.values())[:3]
        for nni in nnis:
            grafted, central = graft_node_pairs(dag, [(nni.parent, nni.child)])
            gp1 = GPEngine(sp, grafted)
            gp1.populate_plvs()
            gp1.compute_likelihoods()
            score_graft = gp1.per_gpcsp_log_likelihoods()[central[0]]
            # "Full add": same structural operation, new engine from scratch.
            grafted2, central2 = graft_node_pairs(
                dag, [(nni.parent, nni.child)]
            )
            gp2 = GPEngine(sp, grafted2)
            gp2.populate_plvs()
            gp2.compute_likelihoods()
            score_full = gp2.per_gpcsp_log_likelihoods()[central2[0]]
            assert abs(score_graft - score_full) < 1e-12

    def test_gp_scored_search_runs(self, data_dir):
        from bito_tpu.nni.engine import GPScoredNNIEngine
        from bito_tpu.core.site_pattern import SitePattern

        coll = parse_newick_file(str(data_dir / "ds1-reduced-5.nwk"))
        seqs = read_fasta(str(data_dir / "ds1-reduced-5.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        dag = build_dag(coll)
        eng = GPScoredNNIEngine(dag, sp, coll.trees)
        eng.set_filter_top_k(1)
        iters = eng.run(max_iter=3)
        assert iters >= 1
        assert len(eng.accepted) == iters
