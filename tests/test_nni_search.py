"""NNI systematic-search harness on DS1 against the MrBayes posterior
(reference: test/nni_search.py + test/test_nni_search.py).

The reference's golden test asserts the exact accepted-NNI hash
trajectory of its TP search (run.811b735.csv); that trajectory is a
fingerprint of its serial Brent/choice-map implementation.  Here the
assertions target the search's *outcome* against the same ground truth:
accepted NNIs must overwhelmingly be credible-posterior edges, the DAG's
credible-edge coverage and contained tree posterior must grow, and the
accepted NNIs must rank highly among the adjacent candidates by PCSP
posterior."""
import os

import numpy as np
import pytest

DS1_DIR = "/root/reference/data/ds1"


@pytest.fixture(scope="module")
def ds1_paths():
    if not os.path.isdir(DS1_DIR):
        pytest.skip("ds1 data not available")
    return dict(
        fasta=os.path.join(DS1_DIR, "ds1.fasta"),
        seed=os.path.join(DS1_DIR, "ds1.top1.nwk"),
        credible=os.path.join(DS1_DIR,
                              "ds1.credible.with-branches.rerooted.nwk"),
        pp=os.path.join(DS1_DIR, "ds1.mb-pp.csv"),
        pcsp_pp=os.path.join(DS1_DIR, "ds1.pcsp-pp.csv"),
    )


class TestPosteriorMaps:
    def test_seed_dag_edges_all_credible(self, ds1_paths):
        """The seed (MrBayes top-1) tree's DAG edges are all in the
        credible PCSP map — the taxon indexing and PCSP string conventions
        line up with the reference-generated CSVs."""
        from bito_tpu.api.gp import gp_instance
        from bito_tpu.nni.search import PosteriorProbabilityMaps

        inst = gp_instance("")
        inst.read_fasta_file(ds1_paths["fasta"])
        inst.read_newick_file(ds1_paths["seed"])
        inst.make_dag()
        maps = PosteriorProbabilityMaps(
            ds1_paths["fasta"], ds1_paths["credible"], ds1_paths["pp"],
            ds1_paths["pcsp_pp"],
        )
        dag = inst.get_dag()
        cred, noncred = maps.get_credible_edge_count(dag)
        assert noncred == 0 and cred == dag.edge_count()
        assert maps.get_credible_edge_total() == 140
        # The top-1 tree carries the top posterior weight.
        assert maps.get_tree_pp(dag) == pytest.approx(0.2758240, abs=1e-6)


class TestNNISearch:
    def test_tp_search_recovers_posterior(self, ds1_paths):
        """12 iterations of top-1 TP-likelihood search: credible-edge
        coverage and contained tree posterior must grow, accepted NNIs are
        mostly credible with high posterior rank."""
        from bito_tpu.nni.search import nni_search

        inst, results = nni_search(
            ds1_paths["fasta"], ds1_paths["seed"], ds1_paths["credible"],
            ds1_paths["pp"], ds1_paths["pcsp_pp"],
            iter_max=12, scoring="tp_likelihood",
        )
        df = results.to_dataframe()
        assert len(df) == 12
        assert np.isfinite(df["score"]).all()
        # Coverage grows: starts at 53 seed edges (all credible) and adds
        # credible edges along the way.
        assert df["cred_edge_count"].iloc[-1] > 53 + 15
        assert (df["cred_edge_count"].diff().dropna() >= 0).all()
        # Contained tree posterior grows well beyond the seed tree's 0.276.
        assert df["tree_pp"].iloc[-1] > 0.5
        assert (df["tree_pp"].diff().dropna() >= -1e-12).all()
        # Acceptance quality: most accepted NNIs are credible edges and
        # rank in the top quartile of adjacent candidates by PCSP posterior.
        assert df["is_nni_cred"].mean() >= 0.5
        cred_rows = df[df["is_nni_cred"]]
        assert (cred_rows["pcsp_pp_rank"]
                <= cred_rows["adj_nni_count"] * 0.25).all()
