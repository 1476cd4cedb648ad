"""Topology sampling from an SBN (rootsplit, then recursive subsplits).

TPU-native rebuild of reference GenericSBNInstance::SampleTopology
(reference: src/generic_sbn_instance.hpp:393-432).  Sampling is host-side
(the trees are handed to the device engines as index tapes), driven by a
numpy Generator for reproducibility.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.bitset import Subsplit, bit_indices, popcount
from ..core.tree import Topology, _renumber
from .support import SBNSupport


class TopologySampler:
    def __init__(self, support: SBNSupport, rng: Optional[np.random.Generator] = None):
        self.support = support
        self.rng = rng or np.random.default_rng()

    def _sample_index(self, probs: np.ndarray, start: int, end: int) -> int:
        seg = probs[start:end]
        total = seg.sum()
        assert total > 0, "SampleIndex given segment with zero weight"
        return start + int(self.rng.choice(end - start, p=seg / total))

    def sample(self, sbn_probabilities: np.ndarray, rooted: bool) -> Topology:
        """sbn_probabilities: probability-normalized (not log) parameters."""
        sup = self.support
        n = sup.num_taxa
        ridx = self._sample_index(sbn_probabilities, 0, sup.rootsplit_count)
        rootsplit = sup.rootsplits[ridx]
        children: List[List[int]] = [[] for _ in range(n)]

        def grow(parent: Subsplit) -> int:
            """Sample the subtree below `parent`, return its node id."""
            kids = []
            for ss in (parent, parent.rotate()):
                clade = ss.clade1  # the focal clade is the second clade
                if popcount(clade) == 1:
                    kids.append(bit_indices(clade)[0])
                else:
                    rng_ = sup.parent_to_range[ss.to_string()]
                    cidx = self._sample_index(sbn_probabilities, *rng_)
                    child_ss = sup.index_to_child[cidx]
                    kids.append(grow(child_ss))
            node = len(children)
            children.append(kids)
            return node

        root = grow(rootsplit)
        topo = _renumber(children, n, root)
        if not rooted:
            topo = deroot_to_trifurcation(topo)
        return topo

    def sample_many(self, sbn_probabilities: np.ndarray, count: int,
                    rooted: bool) -> List[Topology]:
        return [self.sample(sbn_probabilities, rooted) for _ in range(count)]


def deroot_to_trifurcation(topo: Topology) -> Topology:
    """Reference Node::Deroot: remove a bifurcating root, fusing its two
    edges, giving a trifurcation at the surviving internal node."""
    ch = topo.children()
    a, b = ch[topo.root]
    keep = b if b >= topo.num_taxa else a
    move = a if keep == b else b
    assert keep >= topo.num_taxa, "Cannot deroot a cherry-only tree"
    new_children = [list(c) for c in ch[: topo.root]]
    new_children[keep] = new_children[keep] + [move]
    return _renumber(new_children, topo.num_taxa, keep)
