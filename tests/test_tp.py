"""TP engine tests.

Oracles (reference src/gp_doctest.cpp:2733-3157): the choice map's top tree
for any edge of input tree k is the first input tree containing that edge
("take first"), so per-edge TP likelihood/parsimony scores equal the
single-tree engine's scores of those trees (TP-vs-BEAGLE, TP-vs-Sankoff).
"""
import numpy as np
import pytest

from bito_tpu.core.newick import parse_newick_file, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.dag.subsplit_dag import build_dag
from bito_tpu.parsimony.sankoff import SankoffHandler
from bito_tpu.tp.engine import TPEngine


@pytest.fixture(scope="module")
def five_tp(data_dir):
    coll = parse_newick_file(str(data_dir / "five_taxon_rooted.nwk"))
    seqs = read_fasta(str(data_dir / "five_taxon.fasta"))
    sp = SitePattern(seqs, coll.taxon_names)
    dag = build_dag(coll)
    tp = TPEngine(dag, sp)
    tp.initialize_choice_map(coll.trees)
    # five_taxon_rooted.nwk carries no branch lengths; keep the 0.1 defaults
    return coll, tp


class TestChoiceMap:
    def test_first_tree_edges_extract_first_tree(self, five_tp):
        coll, tp = five_tp
        first = coll.trees[0]
        edge_of = tp.choice_map._tree_edge_map(first.topology)
        canon = lambda t: tuple(sorted(
            tuple(sorted(map(str, (s.pretty() for s in []))))
        ))

        def subsplit_set(topo):
            return frozenset(s.pretty() for s in topo.subsplits())

        want = subsplit_set(first.topology)
        for v, e in edge_of.items():
            top = tp.top_tree(e)
            assert subsplit_set(top.topology) == want, (v, e)

    def test_tree_source_take_first(self, five_tp):
        coll, tp = five_tp
        # Every edge of tree 0 has source 0.
        edge_of0 = tp.choice_map._tree_edge_map(coll.trees[0].topology)
        for e in edge_of0.values():
            assert tp.choice_map.tree_source[e] == 0
        # Edges unique to a later tree have that tree as source.
        seen = set(edge_of0.values())
        for k, t in enumerate(coll.trees[1:], 1):
            for e in tp.choice_map._tree_edge_map(t.topology).values():
                if e not in seen:
                    assert tp.choice_map.tree_source[e] == k
                    seen.add(e)


class TestTPScores:
    def test_likelihood_scores_match_single_tree_engine(self, five_tp):
        """Reference 'TPEngine Likelihood scores vs BEAGLE' (gp_doctest:2909):
        each edge's TP score equals the classical likelihood of its top
        tree."""
        coll, tp = five_tp
        scores = tp.top_tree_log_likelihoods()
        assert scores.shape == (tp.dag.edge_count(),)
        # Cross-check: score of edge e == single-engine LL of top_tree(e).
        for e in range(0, tp.dag.edge_count(), 3):
            tree = tp.top_tree(e)
            direct = tp.score_proposed_tree(tree)
            assert abs(scores[e] - direct) < 1e-9, (e, scores[e], direct)

    def test_parsimony_scores_match_sankoff(self, five_tp):
        """Reference 'TPEngine Parsimony scores vs SankoffHandler'
        (gp_doctest:2934)."""
        coll, tp = five_tp
        scores = tp.top_tree_parsimony_scores()
        for e in range(0, tp.dag.edge_count(), 3):
            tree = tp.top_tree(e)
            direct = tp.sankoff.run_sankoff([tree])[0]
            assert abs(scores[e] - direct) < 1e-9

    def test_branch_length_optimization_improves(self, data_dir):
        # Use a realistic alignment (500 sites); the 4-site toy data has
        # optima pinned at the bounds where any coordinate method cycles.
        coll = parse_newick_file(str(data_dir / "ds1-reduced-5.nwk"))
        seqs = read_fasta(str(data_dir / "ds1-reduced-5.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        tp = TPEngine(build_dag(coll), sp)
        tp.initialize_choice_map(coll.trees)
        tp.set_branch_lengths_by_taking_first(coll.trees)
        before = tp.top_tree_log_likelihoods().mean()
        diffs = []
        for _ in range(6):
            old = tp.branch_lengths.copy()
            tp.optimize_branch_lengths(tol=0, max_iter=1)
            diffs.append(float(np.mean(np.abs(tp.branch_lengths - old))))
        after = tp.top_tree_log_likelihoods().mean()
        assert after > before  # scores improve
        assert diffs[-1] < diffs[0] / 2  # branch updates shrink (converging)


class TestEdgeIndirectPV:
    """_EdgeIndirectPV contract (advisor round-4 low finding): non-tuple
    indexing must not silently expose physical row order, and dense()
    must materialize logical edge order after growth."""

    def _make(self):
        import numpy as np
        from bito_tpu.tp.eval_engine import _EdgeIndirectPV

        store = np.zeros((2, 4, 1, 1))
        pv = _EdgeIndirectPV(store, np.arange(3))
        for e in range(3):
            pv[0, e] = e + 1.0
        return np, pv

    def test_non_tuple_access_raises(self):
        np, pv = self._make()
        import pytest

        with pytest.raises(TypeError):
            pv[0]
        with pytest.raises(TypeError):
            pv[0] = 1.0
        pv[:] = 0.0  # whole-store reset stays allowed
        assert float(pv[0, 1]) == 0.0

    def test_dense_is_logical_order_after_growth(self):
        np, pv = self._make()
        # Growth that permutes logical ids: old edges 0,1,2 -> 2,0,1 and
        # one new edge takes logical id 3.
        pv.grow(np.array([2, 0, 1]), 4)
        pv[0, 3] = 9.0
        dense = pv.dense()
        assert dense.shape[1] == 4
        got = [float(dense[0, e, 0, 0]) for e in range(4)]
        # logical 2 holds old edge 0's value (1.0), logical 0 old edge 1
        # (2.0), logical 1 old edge 2 (3.0), logical 3 the new 9.0
        assert got == [2.0, 3.0, 1.0, 9.0]
        assert float(pv[0, 2]) == 1.0
