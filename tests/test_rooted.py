"""Rooted (time-tree) instance parity tests.

Oracles (reference src/rooted_sbn_instance.hpp:277-432, physher/phylotorch):
  - fluA JC69 strict-clock rates=0.001: LL = -4777.616349,
    log-det-Jacobian = -9.25135166, ratios_root_height gradient (68 values)
  - GTR: LL = -5221.438941, substitution gradient (stick-breaking space)
  - HKY: LL = -4931.770107, substitution gradient
  - Weibull shape 0.1: LL = -4618.206253, site gradient -5.231329
  - clock gradient vs finite differences
  - UnconditionalSubsplitProbabilities on five_taxon_rooted_more.nwk
"""
import json
import pathlib

import numpy as np
import pytest

from bito_tpu.api.instances import rooted_instance
from bito_tpu.models.phylo_model import PhyloModelSpecification

GOLDEN = json.load(
    open(pathlib.Path(__file__).parent / "data/rooted_golden.json")
)

PHYSHER_LL = -4777.616349
PHYSHER_JACOBIAN = -9.25135166


def make_flu_instance(data_dir, spec=None):
    inst = rooted_instance("charlie")
    inst.read_newick_file(str(data_dir / "fluA.tree"))
    inst.parse_dates_from_taxon_names(True)
    inst.read_fasta_file(str(data_dir / "fluA.fa"))
    inst.prepare_for_phylo_likelihood(
        spec or PhyloModelSpecification(clock="strict"), 1
    )
    for state in inst.tree_states:
        state.rates[:] = 0.001
    return inst


@pytest.fixture(scope="module")
def flu_jc(data_dir):
    return make_flu_instance(data_dir)


class TestFluJC69:
    def test_log_likelihood_with_jacobian(self, flu_jc):
        ll = flu_jc.log_likelihoods()
        assert abs(ll[0] - (PHYSHER_LL + PHYSHER_JACOBIAN)) < 1e-4

    def test_log_det_jacobian(self, flu_jc):
        j = flu_jc.log_det_jacobian_of_height_transform()
        assert abs(j[0] - PHYSHER_JACOBIAN) < 1e-6

    def test_ratios_root_height_gradient(self, flu_jc):
        grads = flu_jc.phylo_gradients()
        assert abs(grads[0].log_likelihood_ - PHYSHER_LL) < 1e-4
        got = grads[0].gradient_["ratios_root_height"]
        np.testing.assert_allclose(
            got, GOLDEN["fluA_ratios_gradient"], atol=1e-4
        )


class TestFluModels:
    def test_gtr_gradients(self, data_dir):
        inst = make_flu_instance(
            data_dir, PhyloModelSpecification(substitution="GTR",
                                              clock="strict")
        )
        block = inst.get_phylo_model_param_block_map()
        block["substitution_model_frequencies"][:] = [0.1, 0.2, 0.3, 0.4]
        block["substitution_model_rates"][:] = [
            0.05, 0.1, 0.15, 0.20, 0.25, 0.25
        ]
        phylotorch_ll = -5221.438941335706
        ll = inst.log_likelihoods()
        assert abs(ll[0] - (phylotorch_ll + PHYSHER_JACOBIAN)) < 1e-3
        grads = inst.phylo_gradients()
        assert abs(grads[0].log_likelihood_ - phylotorch_ll) < 1e-3
        expected = [49.06451538, 151.83105912, 26.40235659, -8.25135661,
                    75.29759338, 352.56545247, 90.07046995, 30.12301652]
        np.testing.assert_allclose(
            grads[0].gradient_["substitution_model"], expected, atol=1e-3
        )

    def test_hky_gradients(self, data_dir):
        inst = make_flu_instance(
            data_dir, PhyloModelSpecification(substitution="HKY",
                                              clock="strict")
        )
        block = inst.get_phylo_model_param_block_map()
        block["substitution_model_frequencies"][:] = [0.1, 0.2, 0.3, 0.4]
        block["substitution_model_rates"][:] = [3.0]
        phylotorch_ll = -4931.770106816288
        ll = inst.log_likelihoods()
        assert abs(ll[0] - (phylotorch_ll + PHYSHER_JACOBIAN)) < 1e-3
        grads = inst.phylo_gradients()
        assert abs(grads[0].log_likelihood_ - phylotorch_ll) < 1e-4
        expected = [18.218397759598506, 309.56536079428355,
                    47.15713892857574, 42.98132033283943]
        np.testing.assert_allclose(
            grads[0].gradient_["substitution_model"], expected, atol=1e-3
        )

    def test_weibull_gradient(self, data_dir):
        inst = make_flu_instance(
            data_dir, PhyloModelSpecification(site="weibull+4",
                                              clock="strict")
        )
        block = inst.get_phylo_model_param_block_map()
        block["site_model_parameters"][:] = 0.1
        physher_ll = -4618.2062529058
        ll = inst.log_likelihoods()
        assert abs(ll[0] - (physher_ll + PHYSHER_JACOBIAN)) < 1e-4
        grads = inst.phylo_gradients()
        assert abs(grads[0].log_likelihood_ - physher_ll) < 1e-3
        assert abs(grads[0].gradient_["site_model"][0] - -5.231329) < 1e-3

    def test_clock_gradient_vs_finite_differences(self, data_dir):
        inst = make_flu_instance(data_dir)
        grads = inst.phylo_gradients()
        clock_grad = grads[0].gradient_["clock_model"][0]
        # FD: scale all rates of tree 0 by (1 + eps) -- d LL / d(multiplier)
        # at 1 equals sum_i dLL/db_i * b_i.
        eps = 1e-6
        base_rates = inst.tree_states[0].rates.copy()
        inst.tree_states[0].rates[:] = base_rates * (1 + eps)
        lp = inst.log_likelihoods(include_log_det_jacobian=False)[0]
        inst.tree_states[0].rates[:] = base_rates * (1 - eps)
        lm = inst.log_likelihoods(include_log_det_jacobian=False)[0]
        inst.tree_states[0].rates[:] = base_rates
        fd = (lp - lm) / (2 * eps)
        # clock_model grad is wrt the rate multiplier times current rate:
        # sum grads * bl where bl is in time units * rate... the FD perturbs
        # multiplicatively, so fd == sum_i dLL/db_i * b_i = grad * rate(=1
        # multiplier). Compare against sum(per_branch * rates-scaled bl).
        state = inst.tree_states[0]
        tree = inst.tree_collection.trees[0]
        n_edges = tree.topology.num_nodes - 1
        expected_fd = np.sum(
            grads[0].gradient_["branch_lengths"][:n_edges]
            * tree.branch_lengths[:n_edges] * state.rates
        )
        assert abs(fd - expected_fd) < 1e-2 * max(1, abs(fd))
        # And the reported strict-clock gradient uses time-branch lengths.
        assert abs(clock_grad - np.sum(
            grads[0].gradient_["branch_lengths"][:n_edges]
            * tree.branch_lengths[:n_edges]
        )) < 1e-8


class TestUnconditionalProbabilities:
    def test_five_taxon_golden(self, data_dir):
        inst = rooted_instance("rooted")
        inst.read_newick_file(str(data_dir / "five_taxon_rooted_more.nwk"))
        inst.process_loaded_trees()
        inst.train_simple_average()
        correct = {
            "1100000111": 0.5, "1000001111": 0.3, "1110100010": 0.2,
            "1100100100": 0.2, "0100000111": 0.1, "0111000001": 0.2,
            "0101000100": 0.2, "1000001001": 0.2, "0010000011": 0.4,
            "0011000001": 0.2, "1000001000": 0.5, "0100000010": 0.2,
            "0100000001": 0.2, "0010000010": 0.2, "0001000001": 0.4,
        }
        got = inst.unconditional_subsplit_probabilities()
        assert set(got.keys()) == set(correct.keys())
        for k, v in correct.items():
            assert abs(got[k] - v) < 1e-8, (k, got[k], v)


class TestDates:
    def test_parse_dates_from_taxon_names(self, data_dir):
        inst = rooted_instance("charlie")
        inst.read_newick_file(str(data_dir / "fluA.tree"))
        inst.parse_dates_from_taxon_names(True)
        state = inst.tree_states[0]
        # Dates are max-normalized: the most recent tip has height 0.
        assert state.node_heights[: state.leaf_count].min() == 0.0
        # Heights satisfy the time-tree constraints.
        topo = inst.tree_collection.trees[0].topology
        for v in range(topo.num_taxa, topo.num_nodes):
            for c in topo.children()[v]:
                assert state.node_heights[v] >= state.node_heights[c] - 1e-9

    def test_constant_dates(self, data_dir):
        inst = rooted_instance("charlie")
        inst.read_newick_file(str(data_dir / "five_taxon_rooted_more.nwk"))
        inst.set_dates_to_be_constant(False)
        assert all(
            s.node_bounds[: s.leaf_count].max() == 0.0
            for s in inst.tree_states
        )
