"""Native bitocore parity tests: the C++ parser/counters must agree exactly
with the pure-Python implementations (which the golden tests pin)."""
import numpy as np
import pytest

from bito_tpu import _native
from bito_tpu.core.bitset import bits_of_string
from bito_tpu.core.newick import (
    _parse_newick_string,
    parse_newick_text,
)
from bito_tpu.sbn.maps import unrooted_counters as py_unrooted_counters

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native toolchain unavailable"
)


class TestNativeParser:
    def test_nexus_parity(self, data_dir):
        text = open(data_dir / "DS1.subsampled_10.t").read()
        taxa, trees = _native.parse_trees(text, True)
        assert len(taxa) == 27
        assert taxa[0] == "Alligator_mississippiensis"
        assert len(trees) == 10
        for parents, lengths in trees:
            # id invariant: root last, every child id below its parent
            assert parents[-1] == -1
            assert (parents[:-1] > np.arange(len(parents) - 1)).all()

    def test_newick_parity_with_python(self, data_dir):
        text = open(data_dir / "five_taxon_unrooted.nwk").read()
        taxa, trees = _native.parse_trees(text, False)
        coll = parse_newick_text(text)
        assert taxa == coll.taxon_names
        for (p, l), t in zip(trees, coll.trees):
            assert np.array_equal(p, t.topology.parents)
            np.testing.assert_allclose(l, t.branch_lengths)

    def test_quoted_labels(self):
        taxa, trees = _native.parse_trees(
            "('tax one':0.1,[&x]'it''s':0.2,c:0.3);", False
        )
        assert taxa == ["tax one", "it's", "c"]


class TestNativeCounters:
    def test_counters_match_python(self, data_dir):
        text = open(data_dir / "DS1.100_topologies.nwk").read()
        coll = parse_newick_text(text)
        topo_counter = {}
        for t in coll.trees:
            k = t.topology
            topo_counter[k] = topo_counter.get(k, 0) + 1
        rs_py, pcsp_py, _, _ = py_unrooted_counters(topo_counter)
        native = _native.unrooted_counters(
            [t.parents for t in topo_counter],
            list(topo_counter.values()), coll.num_taxa,
        )
        rs_n, pcsp_n = native
        n = coll.num_taxa
        rs_py_int = {
            (bits_of_string(k[:n]), bits_of_string(k[n:])): v
            for k, v in rs_py.items()
        }
        pcsp_py_int = {
            (bits_of_string(k[:n]), bits_of_string(k[n:2 * n]),
             bits_of_string(k[2 * n:])): v
            for k, v in pcsp_py.items()
        }
        assert rs_py_int == rs_n
        assert pcsp_py_int == pcsp_n


class TestNativeRepresentations:
    """Native unrooted indexer representations match the Python path
    exactly (bitocore bc_unrooted_representations vs
    sbn.maps.unrooted_representation)."""

    def test_ds1_parity(self, data_dir):
        from bito_tpu import _native
        from bito_tpu.api.instances import unrooted_instance
        from bito_tpu.sbn import maps

        if not _native.available():
            pytest.skip("native library unavailable")
        inst = unrooted_instance("ds1")
        inst.read_newick_file(str(data_dir / "DS1.100_topologies.nwk"))
        inst.process_loaded_trees()
        sup = inst.sbn_support
        native = sup._native_pcsp_indexer()
        assert native is not None
        sentinel = sup.size()
        topos = [t.topology for t in inst.tree_collection.trees][:10]
        for topo in topos:
            got = [list(map(int, r))
                   for r in sup.indexer_representation_of(topo)]
            want = maps.unrooted_representation(sup.indexer, topo, sentinel)
            assert got == want

    def test_out_of_support_sentinel(self, data_dir):
        """Sampled trees outside the support get the sentinel index, same
        as the Python path."""
        from bito_tpu import _native
        from bito_tpu.api.instances import unrooted_instance
        from bito_tpu.sbn import maps

        if not _native.available():
            pytest.skip("native library unavailable")
        inst = unrooted_instance("five")
        inst.read_newick_file(str(data_dir / "five_taxon_unrooted.nwk"))
        inst.process_loaded_trees()
        inst.train_simple_average()
        sup = inst.sbn_support
        # A support built from one tree only: the others' rootings go
        # out of support.
        small = unrooted_instance("one")
        small.read_newick_file(str(data_dir / "five_taxon_unrooted.nwk"))
        small.tree_collection.trees = small.tree_collection.trees[:1]
        small.process_loaded_trees()
        ssup = small.sbn_support
        sentinel = ssup.size()
        for t in inst.tree_collection.trees:
            got = [list(map(int, r))
                   for r in ssup.indexer_representation_of(t.topology)]
            want = maps.unrooted_representation(ssup.indexer, t.topology,
                                                sentinel)
            assert got == want
