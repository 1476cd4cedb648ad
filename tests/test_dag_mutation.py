"""In-place DAG mutation: AddNodePair / AddNodes / AddEdges / FullyConnect
with ModificationResult reindexers (reference SubsplitDAG::AddNodePair,
src/subsplit_dag.hpp:525-565, and the gp_doctest AddNodePair invariant
checks)."""
import numpy as np
import pytest

from bito_tpu.core.newick import parse_newick_file
from bito_tpu.dag.subsplit_dag import build_dag


def dag_from(data_dir, name, count=None):
    coll = parse_newick_file(str(data_dir / name))
    if count is not None:
        coll.trees = coll.trees[:count]
    return build_dag(coll)


class TestAddNodePair:
    def test_add_missing_pair_grows_dag(self, data_dir):
        small = dag_from(data_dir, "five_taxon_rooted_more_2.nwk", count=2)
        full = dag_from(data_dir, "five_taxon_rooted_more_2.nwk")
        # A (parent, child) pair present in the full DAG but not the small.
        missing = []
        for e in range(full.edge_count()):
            p = full.nodes[int(full.edge_parent[e])]
            c = full.nodes[int(full.edge_child[e])]
            if c.is_leaf():
                continue
            if not small.contains_edge(p, c):
                missing.append((p, c))
        assert missing
        pair = next((pc for pc in missing
                     if small.is_valid_add_node_pair(*pc)), None)
        assert pair is not None

        old_nodes = [s.to_string() for s in small.nodes]
        old_edges = [(small.nodes[int(small.edge_parent[e])].to_string(),
                      small.nodes[int(small.edge_child[e])].to_string())
                     for e in range(small.edge_count())]
        old_node_count = small.node_count()
        result = small.add_node_pair(*pair)

        assert small.is_valid()
        assert small.contains_edge(*pair)
        assert small.node_count() > old_node_count
        # Reindexers preserve identity: old id's bitset == new id's bitset.
        for old_id, s in enumerate(old_nodes):
            assert small.nodes[result.node_reindexer[old_id]].to_string() == s
        for old_id, (ps, cs) in enumerate(old_edges):
            e = result.edge_reindexer[old_id]
            assert small.nodes[int(small.edge_parent[e])].to_string() == ps
            assert small.nodes[int(small.edge_child[e])].to_string() == cs
        # Added ids are exactly the complement of the reindexer image.
        image = set(result.node_reindexer.tolist())
        assert sorted(set(range(small.node_count())) - image) == \
            result.added_node_ids
        assert len(result.added_edge_ids) >= 1

    def test_reindex_edge_data_carries_values(self, data_dir):
        small = dag_from(data_dir, "five_taxon_rooted_more_2.nwk", count=2)
        full = dag_from(data_dir, "five_taxon_rooted_more_2.nwk")
        pair = next(
            ((full.nodes[int(full.edge_parent[e])],
              full.nodes[int(full.edge_child[e])])
             for e in range(full.edge_count())
             if not full.nodes[int(full.edge_child[e])].is_leaf()
             and not small.contains_edge(
                 full.nodes[int(full.edge_parent[e])],
                 full.nodes[int(full.edge_child[e])])
             and small.is_valid_add_node_pair(
                 full.nodes[int(full.edge_parent[e])],
                 full.nodes[int(full.edge_child[e])])),
            None)
        assert pair is not None
        old_pcsp = [small.edge_pcsp(e).to_string()
                    for e in range(small.edge_count())]
        bl = np.arange(small.edge_count(), dtype=np.float64) + 1.0
        result = small.add_node_pair(*pair)
        new_bl = result.reindex_edge_data(bl, small.edge_count(), fill=-1.0)
        # Each carried value sits at the edge with the same PCSP.
        for old_id, pcsp in enumerate(old_pcsp):
            new_id = next(e for e in range(small.edge_count())
                          if small.edge_pcsp(e).to_string() == pcsp)
            assert new_bl[new_id] == bl[old_id]
        # New edges got the fill value.
        assert sorted(np.nonzero(new_bl == -1.0)[0].tolist()) == \
            result.added_edge_ids


class TestFullyConnect:
    def test_fully_connect_is_idempotent_and_valid(self, data_dir):
        dag = dag_from(data_dir, "five_taxon_rooted_more_2.nwk", count=3)
        before = dag.edge_count()
        node_count = dag.node_count()
        r1 = dag.fully_connect()
        assert dag.is_valid()
        assert dag.node_count() == node_count  # only edges are added
        assert dag.edge_count() >= before
        r2 = dag.fully_connect()
        assert not r2.added_edge_ids and not r2.added_node_ids
        # Every valid (parent, child) combination is present.
        for p in range(dag.taxon_count, dag.node_count()):
            pss = dag.nodes[p]
            for c in range(dag.taxon_count, dag.root_id):
                css = dag.nodes[c]
                if css.union in (pss.clade0, pss.clade1):
                    assert dag.contains_edge(pss, css)


class TestAddNodesEdges:
    def test_add_edges_matches_graft(self, data_dir):
        small = dag_from(data_dir, "five_taxon_rooted_more_2.nwk", count=2)
        full = dag_from(data_dir, "five_taxon_rooted_more_2.nwk")
        pairs = []
        for e in range(full.edge_count()):
            p = full.nodes[int(full.edge_parent[e])]
            c = full.nodes[int(full.edge_child[e])]
            if not c.is_leaf() and not small.contains_edge(p, c):
                pairs.append((p, c))
        result = small.add_edges(pairs)
        assert small.is_valid()
        for p, c in pairs:
            assert small.contains_edge(p, c)
        # The grown DAG embeds every topology of the full DAG.
        for t in full.generate_all_topologies():
            assert small.contains_topology(t)
