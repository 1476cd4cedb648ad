"""PhyloFlags tests (reference test/test_phyloflags.py: the option system on
fluA GTR+Weibull rooted gradients)."""
import numpy as np
import pytest

import bito_tpu
from bito_tpu import phylo_flags as flags
from bito_tpu.models.phylo_model import PhyloModelSpecification


@pytest.fixture(scope="module")
def flu(data_dir):
    inst = bito_tpu.rooted_instance("cheese")
    inst.read_newick_file(str(data_dir / "fluA.tree"))
    inst.read_fasta_file(str(data_dir / "fluA.fa"))
    inst.parse_dates_from_taxon_names(True)
    spec = PhyloModelSpecification(
        substitution="GTR", site="weibull+4", clock="strict"
    )
    inst.prepare_for_phylo_likelihood(spec, 1)
    for s in inst.tree_states:
        s.rates[:] = 0.001
    return inst


class TestFlagSelection:
    def test_bare_call_computes_everything(self, flu):
        g = flu.phylo_gradients()[0]
        for key in ("branch_lengths", "ratios_root_height",
                    "substitution_model", "site_model", "clock_model"):
            assert key in g.gradient_, key

    def test_explicit_selection_restricts(self, flu):
        g = flu.phylo_gradients([flags.RATIOS_ROOT_HEIGHT])[0]
        assert "ratios_root_height" in g.gradient_
        assert "substitution_model" not in g.gradient_
        assert "site_model" not in g.gradient_
        assert "clock_model" not in g.gradient_

    def test_pair_form_and_consistency(self, flu):
        g_all = flu.phylo_gradients()[0]
        g_sel = flu.phylo_gradients(
            [(flags.SUBSTITUTION_MODEL, True)]
        )[0]
        np.testing.assert_allclose(
            g_sel.gradient_["substitution_model"],
            g_all.gradient_["substitution_model"],
        )

    def test_jacobian_flag_on_likelihood(self, flu):
        with_j = flu.log_likelihoods()[0]
        without_j = flu.log_likelihoods(
            [(flags.INCLUDE_LOG_DET_JACOBIAN_LIKELIHOOD, False)]
        )[0]
        jac = flu.log_det_jacobian_of_height_transform()[0]
        assert abs(with_j - (without_j + jac)) < 1e-9

    def test_sticky_flags(self, flu):
        flu.set_phylo_flag(flags.RATIOS_ROOT_HEIGHT, True)
        g = flu.phylo_gradients()[0]
        assert "substitution_model" not in g.gradient_
        flu.clear_phylo_flags()
        g = flu.phylo_gradients()[0]
        assert "substitution_model" in g.gradient_

    def test_unknown_flag_raises(self, flu):
        with pytest.raises(ValueError):
            flu.phylo_gradients(["not_a_flag"])

    def test_jacobian_gradient_flag(self, flu):
        from bito_tpu.treelike import rooted as rooted_mod

        g_with = flu.phylo_gradients(
            [flags.RATIOS_ROOT_HEIGHT]
        )[0].gradient_["ratios_root_height"]
        flu.set_phylo_flag(flags.RATIOS_ROOT_HEIGHT, True)
        flu.set_phylo_flag(flags.INCLUDE_LOG_DET_JACOBIAN_GRADIENT, False)
        g_without = flu.phylo_gradients()[0].gradient_["ratios_root_height"]
        flu.clear_phylo_flags()
        jac_grad = rooted_mod.gradient_log_det_jacobian(flu.tree_states[0])
        np.testing.assert_allclose(g_with, g_without + jac_grad, atol=1e-10)
