"""DAG topology sampler (reference src/topology_sampler.{hpp,cpp} doctests
"TopologySampler" / "TopologySampler: Non-uniform prior", rebuilt as exact
conditional-probability checks: sampling from origin node v draws topology t
with probability P(t) * 1[v in t] / P(v)."""
import numpy as np
import pytest

from bito_tpu.core.newick import parse_newick_file
from bito_tpu.dag.sampler import DAGTopologySampler
from bito_tpu.dag.subsplit_dag import build_dag


@pytest.fixture(scope="module")
def dag(data_dir):
    coll = parse_newick_file(str(data_dir / "five_taxon_rooted_more_2.nwk"))
    return build_dag(coll)


def topology_probabilities(dag, q):
    topos = dag.generate_all_topologies()
    probs = [
        float(np.prod([q[i] for i in
                       dag.indexer_representation_of_topology(t)]))
        for t in topos
    ]
    return topos, np.asarray(probs)


def contains_node(dag, topo, node_id):
    return any(
        dag.subsplit_to_id.get(ss.to_string()) == node_id
        for ss in topo.subsplits(rooted=True)
    )


def empirical(dag, q, inv, origin, n, seed):
    sampler = DAGTopologySampler(seed=seed)
    counts = {}
    for _ in range(n):
        t = sampler.sample(dag, q, inv, origin)
        counts[t.key()] = counts.get(t.key(), 0) + 1
    return counts


class TestDAGTopologySampler:
    def test_uniform_prior_from_leaf(self, dag):
        """Sampling from a leaf (in every topology) draws the plain SBN
        distribution; uniform-on-support = 1/4 per embedded topology."""
        q = dag.build_uniform_on_topological_support_prior()
        inv = dag.inverted_gpcsp_probabilities(
            q, dag.unconditional_node_probabilities(q))
        topos, probs = topology_probabilities(dag, q)
        assert len(topos) == 4
        np.testing.assert_allclose(probs, 0.25)
        counts = empirical(dag, q, inv, origin=0, n=4000, seed=3)
        for t, p in zip(topos, probs):
            assert abs(counts.get(t.key(), 0) / 4000 - p) < 5e-2

    def test_nonuniform_prior_from_internal_node(self, dag):
        """With a non-uniform prior and an internal origin, the sampler
        draws P(t | v in t) — the rootward inverted-probability walk."""
        rng = np.random.default_rng(11)
        q = np.empty(dag.edge_count())
        for (node, side), (s, e) in dag.parent_to_child_range.items():
            w = rng.uniform(0.2, 1.0, size=e - s)
            q[s:e] = w / w.sum()
        p_node = dag.unconditional_node_probabilities(q)
        inv = dag.inverted_gpcsp_probabilities(q, p_node)
        topos, probs = topology_probabilities(dag, q)
        np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-12)

        # An internal node contained in a strict subset of the topologies.
        candidates = [
            v for v in range(dag.taxon_count, dag.root_id)
            if 0.0 < p_node[v] < 1.0 - 1e-9
            and sum(contains_node(dag, t, v) for t in topos) >= 1
        ]
        origin = candidates[0]
        counts = empirical(dag, q, inv, origin, n=4000, seed=5)
        total_cond = 0.0
        for t, p in zip(topos, probs):
            exp = (p / p_node[origin]
                   if contains_node(dag, t, origin) else 0.0)
            total_cond += exp
            assert abs(counts.get(t.key(), 0) / 4000 - exp) < 5e-2
        np.testing.assert_allclose(total_cond, 1.0, rtol=1e-9)

    def test_sample_from_root_and_rootsplit(self, dag):
        q = dag.build_uniform_on_topological_support_prior()
        inv = dag.inverted_gpcsp_probabilities(
            q, dag.unconditional_node_probabilities(q))
        sampler = DAGTopologySampler(seed=9)
        for origin in [dag.root_id] + dag.rootsplit_ids()[:1]:
            t = sampler.sample(dag, q, inv, origin)
            assert dag.contains_topology(t)
            assert t.num_taxa == dag.taxon_count
