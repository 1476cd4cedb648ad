"""Batched-vs-serial proposed-NNI scoring parity.

The batched scorer (bito_tpu/tp/batch_scorer.py) must reproduce the serial
faithful path (`FaithfulTPEvalEngine.score_proposed_nni`) to f64
reassociation tolerance on the same DAG state — the reference's hot loop
(src/nni_engine.cpp:230-257) run as one XLA dispatch.
"""
import numpy as np
import pytest

DATA = "/root/reference/data"
DS1 = "/root/reference/data/ds1"


def _fresh_search(fasta, nwk, opt_max=1):
    from bito_tpu.core.newick import parse_newick_file, read_fasta
    from bito_tpu.core.site_pattern import SitePattern
    from bito_tpu.dag.reference_order import build_dag_reference_ordered
    from bito_tpu.nni.golden import GoldenNNISearch

    collection = parse_newick_file(nwk)
    alignment = read_fasta(fasta)
    sp = SitePattern(alignment, collection.taxon_names)
    dag = build_dag_reference_ordered(collection)
    search = GoldenNNISearch(dag, sp, collection.trees, opt_max=opt_max)
    search.run_init()
    return search


def _compare(search, tol):
    eng = search.engine
    nnis = sorted(search.adjacent, key=lambda n: (n[0].to_string(),
                                                  n[1].to_string()))
    assert nnis, "no adjacent NNIs to score"
    best_edge_map = (eng.build_best_edge_map(nnis)
                     if eng.use_best_edge_map else None)
    serial = np.array([eng.score_proposed_nni(nni, best_edge_map)
                       for nni in nnis])
    batched = np.asarray(eng.score_proposed_nnis_batched(nnis,
                                                         best_edge_map))
    np.testing.assert_allclose(batched, serial, rtol=tol, atol=0)
    return len(nnis)


class TestBatchScorer:
    def test_five_taxon_parity(self):
        search = _fresh_search(f"{DATA}/five_taxon.fasta",
                               f"{DATA}/five_taxon_trees_3_4_diff_branches.nwk", opt_max=5)
        n = _compare(search, 1e-12)
        assert n >= 4

    def test_ds1_parity_and_growth(self):
        search = _fresh_search(f"{DS1}/ds1.fasta", f"{DS1}/ds1.top1.nwk",
                               opt_max=1)
        n = _compare(search, 1e-11)
        assert n >= 10
        # After one acceptance + incremental update the PVs include locally
        # re-optimized state; parity must hold on the grown DAG too.
        search.run_main_loop()
        search.run_post_loop()
        _compare(search, 1e-11)

    def test_engine_routes_through_batched(self, monkeypatch):
        """score_adjacent_nnis uses ONE batched dispatch when x64 is on."""
        search = _fresh_search(f"{DATA}/five_taxon.fasta",
                               f"{DATA}/five_taxon_trees_3_4_diff_branches.nwk")
        eng = search.engine
        calls = {"serial": 0}
        orig = eng.score_proposed_nni

        def counting(*a, **k):
            calls["serial"] += 1
            return orig(*a, **k)

        monkeypatch.setattr(eng, "score_proposed_nni", counting)
        nnis = sorted(search.adjacent, key=lambda n: (n[0].to_string(),
                                                      n[1].to_string()))
        scores = eng.score_adjacent_nnis(nnis)
        assert len(scores) == len(nnis)
        assert calls["serial"] == 0, "batched path should not call serial"
        eng.use_batched_scorer = False
        scores2 = eng.score_adjacent_nnis(nnis)
        assert calls["serial"] == len(nnis)
        np.testing.assert_allclose(scores, scores2, rtol=1e-12)


def test_batched_matches_serial_at_scale():
    """Round-3 weakness: the batched path was only exercised at DS1's
    tens-of-candidates scale.  Grow the DS1 DAG for 25 iterations, then
    score the ENTIRE adjacent set (hundreds of candidates, spanning
    several padding buckets) batched and serially and pin them to each
    other at f64 reassociation tolerance."""
    import numpy as np

    from bito_tpu.core.newick import parse_newick_file, read_fasta
    from bito_tpu.core.site_pattern import SitePattern
    from bito_tpu.dag.reference_order import build_dag_reference_ordered
    from bito_tpu.nni.golden import GoldenNNISearch, nni_sort_key

    DS1 = "/root/reference/data/ds1"
    collection = parse_newick_file(f"{DS1}/ds1.top1.nwk")
    alignment = read_fasta(f"{DS1}/ds1.fasta")
    sp = SitePattern(alignment, collection.taxon_names)
    dag = build_dag_reference_ordered(collection)
    search = GoldenNNISearch(dag, sp, collection.trees, opt_max=1)
    search.run(iter_max=25)
    nnis = sorted(search.adjacent, key=nni_sort_key)
    assert len(nnis) >= 150, len(nnis)
    eng = search.engine
    best_edge_map = eng.build_best_edge_map(nnis)
    batched = eng.score_proposed_nnis_batched(nnis, best_edge_map)
    serial = np.array([eng.score_proposed_nni(nni, best_edge_map)
                       for nni in nnis])
    np.testing.assert_allclose(np.asarray(batched), serial, rtol=0,
                               atol=5e-9)
