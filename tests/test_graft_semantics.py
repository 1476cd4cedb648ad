"""Graft-scoring semantic gap, quantified and closed (VERDICT round-4
task 9).

The reference scores each candidate NNI from a 12-PV scratch workspace fed
by FROZEN host PLVs, with q/branch lengths COPIED from pre-NNI counterparts
(/root/reference/src/nni_evaluation_engine.cpp:229-463); its oracle
("Proposed NNI vs DAG NNI GPLikelihoods",
/root/reference/src/gp_doctest.cpp:1937) certifies graft == truth on a
fully connected DAG with the null prior (q=1, src/gp_engine.cpp:60) and
fixed branch lengths.

Round-5 measurement on five_taxon (this file): this repo's previous
scoring — graft ALL candidates into one rebuilt DAG and let priors
renormalize — REORDERED candidates vs the truth oracle under shipped
priors (top-1 changed; per-candidate shifts up to ~5 log units from prior
mass dilution across 22 simultaneous candidates).  Under the oracle's
null-prior preconditions the ranking was unchanged (PLV cross-candidate
contamination alone is orders of magnitude below the score spread).

The fix, mirroring the reference: GPScoredNNIEngine._carry_q freezes host
q and copies each candidate's new-edge q from its pre-NNI counterpart
(nni/engine.py).  These tests pin (1) the oracle-precondition equality,
(2) the frozen-q product path ranking candidates identically to
one-candidate-at-a-time truth scoring under shipped priors.
"""
import numpy as np
import pytest

DATA = "/root/reference/data"


def _dag_and_pattern(fully_connect: bool):
    from bito_tpu.api.gp import gp_instance
    from bito_tpu.core.site_pattern import SitePattern

    inst = gp_instance("")
    inst.read_fasta_file(f"{DATA}/five_taxon.fasta")
    inst.read_newick_file(f"{DATA}/five_taxon_rooted.nwk")
    inst.make_dag()
    dag = inst.get_dag()
    if fully_connect:
        dag.fully_connect()  # oracle precondition (gp_doctest.cpp:1934)
    sp = SitePattern(inst.alignment, inst.tree_collection.taxon_names)
    return inst, dag, sp


def _score_null_prior(dag, sp, pairs, fixed_bl=0.1):
    """Central-edge per-PCSP log likelihoods on the grafted DAG under the
    oracle preconditions (q=1, inverted prior 1, fixed branch lengths)."""
    from bito_tpu.dag.graft import graft_node_pairs
    from bito_tpu.gp.engine import GPEngine

    grafted, central = graft_node_pairs(dag, pairs)
    eng = GPEngine(sp, grafted)
    eng.q = np.ones(grafted.edge_count())
    eng.inverted_sbn_prior = np.ones_like(
        np.asarray(eng.inverted_sbn_prior))
    eng.branch_lengths = np.full(grafted.edge_count(), fixed_bl)
    eng.populate_plvs()
    eng.compute_likelihoods()
    ll = np.asarray(eng.per_gpcsp_log_likelihoods())
    return [float(ll[c]) for c in central]


def test_oracle_preconditions_allatonce_matches_truth():
    """Null prior + fixed branch lengths (the reference's own oracle
    regime): all-at-once grafting matches one-at-a-time truth scoring to
    well under the candidate spread, with identical ranking."""
    from bito_tpu.nni.engine import NNIEngine

    inst, dag, sp = _dag_and_pattern(fully_connect=True)
    enum = NNIEngine(dag, sp, inst.tree_collection.trees)
    enum.sync_adjacent_nnis_with_dag()
    pairs = [(nni.parent, nni.child) for nni in enum.adjacent.values()]
    assert len(pairs) >= 3
    product = _score_null_prior(dag, sp, pairs)
    truth = [_score_null_prior(dag, sp, [p])[0] for p in pairs]
    gaps = np.abs(np.asarray(product) - np.asarray(truth))
    spread = max(truth) - min(truth)
    assert list(np.argsort(product)) == list(np.argsort(truth)), (
        f"ranking diverged: product={product} truth={truth}")
    assert gaps.max() < 0.05 * max(spread, 1e-3), (gaps.max(), spread)


def test_frozen_q_product_scoring_matches_truth_ranking():
    """The SHIPPED scoring path (GPScoredNNIEngine with frozen-q carry)
    must rank candidates identically to scoring each candidate alone
    with the same frozen semantics — the renormalized-prior reorder this
    file's round-5 measurement exposed must stay fixed."""
    from bito_tpu.dag.graft import graft_node_pairs
    from bito_tpu.gp.engine import GPEngine
    from bito_tpu.nni.engine import GPScoredNNIEngine

    inst, dag, sp = _dag_and_pattern(fully_connect=False)
    eng = GPScoredNNIEngine(dag, sp, inst.tree_collection.trees)
    eng.sync_adjacent_nnis_with_dag()
    keys = list(eng.adjacent.keys())
    assert len(keys) >= 3
    eng.score_adjacent_nnis()
    product = {k: eng.scored[k] for k in keys}

    host_bl = dict(zip(eng.gp.dag.pretty_edges(),
                       np.asarray(eng.gp.branch_lengths)))
    truth = {}
    for k in keys:
        nni = eng.adjacent[k]
        grafted, central = graft_node_pairs(dag, [(nni.parent, nni.child)])
        e1 = GPEngine(sp, grafted, caps=dict(eng._gp_caps))
        eng._carry_branch_lengths(e1, host_bl)
        eng._carry_q(e1, [k])
        e1.populate_plvs()
        e1.compute_likelihoods()
        truth[k] = float(
            np.asarray(e1.per_gpcsp_log_likelihoods())[central[0]])

    p = np.asarray([product[k] for k in keys])
    t = np.asarray([truth[k] for k in keys])
    assert list(np.argsort(p)) == list(np.argsort(t)), (
        f"frozen-q product scoring reorders candidates: {product} vs "
        f"{truth}")
    # Residual gap (cross-candidate PLV contamination only) stays small
    # relative to the spread the filter discriminates over.
    spread = t.max() - t.min()
    assert np.abs(p - t).max() < 0.1 * max(spread, 1e-3), (
        np.abs(p - t).max(), spread)


def test_gap_magnitudes_recorded(capsys):
    """Record the renormalized-vs-truth gap that motivated the frozen-q
    fix (the measurement artifact for IMPLEMENTATION_NOTES round 5)."""
    from bito_tpu.dag.graft import graft_node_pairs
    from bito_tpu.gp.engine import GPEngine
    from bito_tpu.nni.engine import NNIEngine

    inst, dag, sp = _dag_and_pattern(fully_connect=True)
    enum = NNIEngine(dag, sp, inst.tree_collection.trees)
    enum.sync_adjacent_nnis_with_dag()
    pairs = [(nni.parent, nni.child) for nni in enum.adjacent.values()]

    def renorm_scores(subset):
        grafted, central = graft_node_pairs(dag, subset)
        e = GPEngine(sp, grafted)
        e.populate_plvs()
        e.compute_likelihoods()
        ll = np.asarray(e.per_gpcsp_log_likelihoods())
        return [float(ll[c]) for c in central]

    product = renorm_scores(pairs)
    truth = [renorm_scores([p])[0] for p in pairs]
    gaps = np.abs(np.asarray(product) - np.asarray(truth))
    reordered = list(np.argsort(product)) != list(np.argsort(truth))
    print(f"graft-semantics[renormalized]: n={len(pairs)} "
          f"max_gap={gaps.max():.3e} mean_gap={gaps.mean():.3e} "
          f"spread={max(truth)-min(truth):.3e} reordered={reordered}")
