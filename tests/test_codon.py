"""Codon-model (A=64-padded MG94) correctness vs a dense host computation.

The scan tape is state-generic; these tests pin the 61-state model against
an independent numpy implementation (expm via eigendecomposition, plain
per-site pruning, no rescaling tricks) on a 5-taxon tree.
"""
import numpy as np
import pytest

from bito_tpu.core.newick import parse_newick_file
from bito_tpu.models import codon as cd


def _dense_ll(topo, bl, tips61, pi, Q):
    """Per-site pruning in plain numpy over the 61 real states."""
    lam, V = np.linalg.eig(Q)
    Vinv = np.linalg.inv(V)

    def P(t):
        return np.real(V @ np.diag(np.exp(lam * t)) @ Vinv)

    S = tips61.shape[1]
    ch = topo.children()
    partial = {}
    for leaf in range(topo.num_taxa):
        partial[leaf] = tips61[leaf].T  # [61, S]
    for u in range(topo.num_taxa, topo.num_nodes):
        acc = np.ones((61, S))
        for c in ch[u]:
            acc = acc * (P(bl[c]) @ partial[c])
        partial[u] = acc
    site = pi @ partial[topo.root]
    return float(np.log(site).sum())


class TestCodonModel:
    def test_mg94_rate_matrix_properties(self):
        model = cd.CodonModel(kappa=2.5, omega=0.3,
                              nuc_freqs=(0.3, 0.2, 0.3, 0.2))
        Q, pi = model.Q61, model.pi61
        np.testing.assert_allclose(Q.sum(axis=1), 0.0, atol=1e-12)
        # reversibility: pi_i q_ij == pi_j q_ji
        np.testing.assert_allclose(pi[:, None] * Q, (pi[:, None] * Q).T,
                                   atol=1e-12)
        # unit expected rate
        np.testing.assert_allclose(-np.dot(pi, np.diag(Q)), 1.0,
                                   rtol=1e-12)
        # padded eigensystem reconstructs Q with identity pads
        U, vals, Uinv = model.U, model.values, model.U_inv
        Qp = U @ np.diag(vals) @ Uinv
        np.testing.assert_allclose(Qp[:61, :61], Q, atol=1e-10)
        np.testing.assert_allclose(Qp[61:, 61:], 0.0, atol=1e-12)

    def test_ll_matches_dense_host(self, data_dir):
        coll = parse_newick_file(str(data_dir / "five_taxon_unrooted.nwk"))
        topo = coll.trees[0].topology
        rng = np.random.default_rng(11)
        bl = rng.uniform(0.05, 0.6, topo.num_nodes)
        model = cd.CodonModel(kappa=2.0, omega=0.15,
                              nuc_freqs=(0.28, 0.22, 0.26, 0.24))
        # random codon alignment: 40 codons over the taxa
        S = 40
        states = rng.integers(0, 61, (topo.num_taxa, S))
        tips = np.zeros((topo.num_taxa, S, 64))
        tips[np.arange(topo.num_taxa)[:, None], np.arange(S)[None, :],
             states] = 1.0
        weights = np.ones(S)
        ll = cd.codon_log_likelihoods(
            [topo], bl[None, :], tips, weights, model)
        dense = _dense_ll(topo, bl, tips[:, :, :61], model.pi61, model.Q61)
        assert float(np.asarray(ll)[0]) == pytest.approx(dense, rel=1e-9)

    def test_tip_partials_and_gaps(self):
        seqs = {"a": "ATGTTT", "b": "ATGNNN"}
        tp = cd.codon_tip_partials(seqs, ["a", "b"])
        assert tp.shape == (2, 2, 64)
        assert tp[0, 0, cd.CODON_INDEX["ATG"]] == 1.0
        assert tp[0, 0].sum() == 1.0
        # ambiguous codon: all-ones over sense states, zero on pads
        assert tp[1, 1, :61].sum() == 61
        assert tp[1, 1, 61:].sum() == 0

    def test_gamma_categories(self, data_dir):
        """Codon model composes with discrete rate categories."""
        coll = parse_newick_file(str(data_dir / "five_taxon_unrooted.nwk"))
        topo = coll.trees[0].topology
        rng = np.random.default_rng(3)
        bl = rng.uniform(0.05, 0.4, topo.num_nodes)
        model = cd.CodonModel()
        S = 12
        states = rng.integers(0, 61, (topo.num_taxa, S))
        tips = np.zeros((topo.num_taxa, S, 64))
        tips[np.arange(topo.num_taxa)[:, None], np.arange(S)[None, :],
             states] = 1.0
        w = np.ones(S)
        rates = [0.5, 1.5]
        props = [0.5, 0.5]
        ll = float(np.asarray(cd.codon_log_likelihoods(
            [topo], bl[None, :], tips, w, model,
            category_rates=rates, category_proportions=props))[0])
        # dense: average of the two scaled-rate likelihood surfaces
        per_site = []
        for r in rates:
            lam, V = np.linalg.eig(model.Q61)
            Vinv = np.linalg.inv(V)
            ch = topo.children()
            partial = {leaf: tips[leaf, :, :61].T
                       for leaf in range(topo.num_taxa)}
            for u in range(topo.num_taxa, topo.num_nodes):
                acc = np.ones((61, S))
                for c in ch[u]:
                    P = np.real(V @ np.diag(
                        np.exp(lam * bl[c] * r)) @ Vinv)
                    acc = acc * (P @ partial[c])
                partial[u] = acc
            per_site.append(model.pi61 @ partial[topo.root])
        dense = float(np.log(
            0.5 * per_site[0] + 0.5 * per_site[1]).sum())
        assert ll == pytest.approx(dense, rel=1e-9)

    def test_gradients_match_finite_difference(self, data_dir):
        """A=64 branch gradients (linear-time preorder pass on the same
        tape) vs central finite differences."""
        coll = parse_newick_file(str(data_dir / "five_taxon_unrooted.nwk"))
        topo = coll.trees[0].topology
        rng = np.random.default_rng(5)
        bl = rng.uniform(0.05, 0.5, topo.num_nodes)
        model = cd.CodonModel(kappa=2.0, omega=0.2)
        S = 20
        states = rng.integers(0, 61, (topo.num_taxa, S))
        tips = np.zeros((topo.num_taxa, S, 64))
        tips[np.arange(topo.num_taxa)[:, None], np.arange(S)[None, :],
             states] = 1.0
        w = np.ones(S)
        ll, grads = cd.codon_ll_and_gradients(
            [topo], bl[None, :], tips, w, model)
        ll, grads = float(np.asarray(ll)[0]), np.asarray(grads)[0]
        eps = 1e-6
        for e in (0, 2, topo.num_taxa):
            blp = bl.copy(); blp[e] += eps
            blm = bl.copy(); blm[e] -= eps
            lp = float(np.asarray(cd.codon_log_likelihoods(
                [topo], blp[None, :], tips, w, model))[0])
            lm = float(np.asarray(cd.codon_log_likelihoods(
                [topo], blm[None, :], tips, w, model))[0])
            fd = (lp - lm) / (2 * eps)
            assert grads[e] == pytest.approx(fd, rel=1e-5, abs=1e-6)
