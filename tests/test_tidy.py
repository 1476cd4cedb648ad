"""TidySubsplitDAG parity vs the reference's own doctest oracle
("TidySubsplitDAG: slicing", /root/reference/src/tidy_subsplit_dag.hpp:
204-241).  The oracle's node ids are translated to subsplit-keyed lookups
so the assertions are independent of internal id assignment."""
import numpy as np
import pytest

from bito_tpu.core.bitset import Subsplit
from bito_tpu.core.tree import Topology
from bito_tpu.dag.subsplit_dag import LEFT, RIGHT, build_dag_from_topologies
from bito_tpu.dag.tidy import TidySubsplitDAG, TidyTraversalAction


def _topo(spec, num_taxa):
    """Build a Topology from a nested tuple spec of leaf ids."""
    children = [[] for _ in range(num_taxa)]
    counter = [num_taxa]

    def build(s):
        if isinstance(s, int):
            return s
        kids = [build(x) for x in s]
        node = counter[0]
        counter[0] += 1
        children.append(kids)
        return node

    root = build(spec)
    from bito_tpu.core.tree import _renumber

    return _renumber(children, num_taxa, root)


def _motivating():
    """Reference MotivatingExample: topologies (0,(1,(2,3))) and
    ((0,(2,3)),1) over 4 taxa (src/node.cpp:561-564)."""
    t3 = _topo((0, (1, (2, 3))), 4)
    t4 = _topo(((0, (2, 3)), 1), 4)
    return build_dag_from_topologies([t3, t4], ["t0", "t1", "t2", "t3"])


def _ss(dag, clade_a, clade_b):
    n = dag.taxon_count
    ca = sum(1 << i for i in clade_a)
    cb = sum(1 << i for i in clade_b)
    return dag.get_node_id(Subsplit.of_pair(ca, cb, n))


class TestTidySlicing:
    def test_trivial_example_above_matrices(self):
        """Reference TrivialExample ((0,1),2): every leaf/internal node's
        above set includes itself and all its DAG ancestors."""
        t = _topo(((0, 1), 2), 3)
        dag = build_dag_from_topologies([t], ["t0", "t1", "t2"])
        tidy = TidySubsplitDAG(dag)
        n01 = _ss(dag, [0, 1], [2])  # rootsplit (01|2)... parent of (0|1)
        root = dag.root_id
        for leaf in (0, 1):
            above = set(np.where(tidy.above_node(leaf))[0])
            assert leaf in above and root in above and n01 in above
        above2 = set(np.where(tidy.above_node(2))[0])
        assert 2 in above2 and root in above2

    def test_motivating_example_slices(self):
        """The reference doctest's slicing oracle, subsplit-keyed:
        node4 = (2|3), node7 = (0|23)."""
        dag = _motivating()
        tidy = TidySubsplitDAG(dag)
        n23 = _ss(dag, [2], [3])
        n0_23 = _ss(dag, [0], [2, 3])

        # BelowNode(left, 0|23) = {leaf0, 0|23}; BelowNode(right, 0|23)
        # = {2, 3, (2|3), 0|23}  (reference lines 224-227; the reference's
        # "rotated"/true side holds leaf 0 there — sides here follow this
        # repo's clade ordering, so compare as sets over both sides).
        below_sides = {
            frozenset(np.where(tidy.below_node(n0_23, LEFT))[0]),
            frozenset(np.where(tidy.below_node(n0_23, RIGHT))[0]),
        }
        assert frozenset({0, n0_23}) in below_sides
        assert frozenset({2, 3, n23, n0_23}) in below_sides

        # AboveNode(2|3): itself plus every ancestor on any path
        above = set(np.where(tidy.above_node(n23))[0])
        assert n23 in above and dag.root_id in above
        assert n0_23 in above  # (0|23) sits above (2|3) via topology 4
        assert 0 not in above and 1 not in above

    def test_dirty_propagation_matches_reference(self):
        """SetDirtyStrictlyAbove dirties exactly the strict ancestors on
        each side; IsDirtyBelow sees dirt only from below; SetClean
        clears (reference doctest lines 229-235)."""
        dag = _motivating()
        tidy = TidySubsplitDAG(dag)
        n23 = _ss(dag, [2], [3])
        tidy.set_dirty_strictly_above(n23)
        dirty_union = tidy.dirty[LEFT] | tidy.dirty[RIGHT]
        expect = tidy.above_node(n23)
        expect[n23] = False
        # every strict ancestor is dirty on at least one side; nothing else
        assert set(np.where(dirty_union)[0]) <= set(np.where(expect)[0])
        assert dirty_union.any()
        assert not tidy.is_dirty_below(n23, LEFT)
        assert not tidy.is_dirty_below(n23, RIGHT)
        root = dag.root_id
        assert (tidy.is_dirty_below(root, LEFT)
                or tidy.is_dirty_below(root, RIGHT))
        tidy.set_clean()
        assert not (tidy.dirty[LEFT] | tidy.dirty[RIGHT]).any()

    def test_tidy_traversal_updates_before_modifying(self):
        """The tidy traversal contract (reference
        DepthFirstWithTidyAction): whenever modify_edge fires for
        (node, side), the node's OTHER clade is clean — any dirt below it
        was repaired by update_edge calls first — and every edge of the
        DAG is modified exactly once."""
        dag = _motivating()
        tidy = TidySubsplitDAG(dag)
        events = []

        def on_modify(n, c, s):
            other = RIGHT if s == LEFT else LEFT
            assert not tidy.is_dirty_below(n, other), (n, c, s)
            events.append(("modify", n, c, bool(s)))

        def on_update(n, c, s):
            events.append(("update", n, c, bool(s)))

        tidy.depth_first_with_tidy_action(
            [dag.root_id],
            TidyTraversalAction(modify_edge=on_modify,
                                update_edge=on_update))
        modified = {(n, c) for kind, n, c, s in events if kind == "modify"}
        all_edges = {(int(dag.edge_parent[e]), int(dag.edge_child[e]))
                     for e in range(dag.edge_count())}
        assert modified == all_edges
        # The motivating example forces at least one mid-traversal update
        # (the reference's raison d'etre for the tidy machinery).
        assert any(kind == "update" for kind, *_ in events)
