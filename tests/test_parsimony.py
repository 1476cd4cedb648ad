"""Sankoff parsimony parity tests.

Oracles (reference src/sankoff_handler.hpp test cases):
  - asymmetric cost matrix on hello_single_nucleotide -> score 8 (line 186)
  - unit-cost scores equal Fitch parsimony computed by brute force
"""
import itertools

import numpy as np

from bito_tpu.core.newick import parse_newick_file, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.parsimony.sankoff import SankoffHandler, default_cost_matrix


def brute_force_parsimony(tree, tip_states, cost):
    topo = tree.topology
    n = topo.num_taxa
    S = tip_states.shape[1]
    total = 0.0
    internals = list(range(n, topo.num_nodes))
    for s in range(S):
        best = np.inf
        for assign in itertools.product(range(4), repeat=len(internals)):
            state = {internals[i]: assign[i] for i in range(len(internals))}
            sc = 0.0
            ok = True
            for v in range(topo.num_nodes - 1):
                p = int(topo.parents[v])
                if v < n:
                    sv = tip_states[v, s]
                    if sv == 4:
                        # gap: choose the cheapest state
                        sc += min(cost[state[p], a] for a in range(4))
                        continue
                else:
                    sv = state[v]
                sc += cost[state[p], sv]
            best = min(best, sc)
        total += best
    return total


class TestSankoff:
    def test_asymmetric_golden(self, data_dir):
        coll = parse_newick_file(str(data_dir / "hello_rooted.nwk"))
        seqs = read_fasta(str(data_dir / "hello_single_nucleotide.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        costs = np.array([
            [0., 2., 3., 4.], [5., 0., 7., 8.],
            [9., 10., 0., 12.], [13., 14., 15., 0.],
        ])
        sh = SankoffHandler(sp, costs)
        totals = sh.run_sankoff(coll.trees)
        assert abs(totals[0] - 8.0) < 1e-10

    def test_unit_cost_vs_brute_force(self, data_dir):
        coll = parse_newick_file(str(data_dir / "hello_rooted.nwk"))
        seqs = read_fasta(str(data_dir / "hello.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        sh = SankoffHandler(sp)
        totals = sh.run_sankoff(coll.trees)
        cost = default_cost_matrix()
        states = sp.tip_states()
        bf_total = 0.0
        for s_idx in range(sp.pattern_count):
            bf_total += sp.weights[s_idx] * brute_force_parsimony(
                coll.trees[0], states[:, s_idx:s_idx + 1], cost
            )
        assert abs(totals[0] - bf_total) < 1e-9

    def test_batched_trees(self, data_dir):
        coll = parse_newick_file(str(data_dir / "five_taxon_rooted.nwk"))
        seqs = read_fasta(str(data_dir / "five_taxon.fasta"))
        sp = SitePattern(seqs, coll.taxon_names)
        sh = SankoffHandler(sp)
        totals = sh.run_sankoff(coll.trees)
        assert totals.shape == (len(coll.trees),)
        # batch result equals per-tree results
        for i, t in enumerate(coll.trees):
            single = sh.run_sankoff([t])
            assert abs(single[0] - totals[i]) < 1e-10
