"""Batched proposed-NNI scoring: the 5-edge local program as one XLA dispatch.

Candidate NNI scoring is the reference's declared hot loop
(reference src/nni_engine.cpp:230-257 FilterScoreAdjacentNNIs;
src/tp_evaluation_engine.cpp:466-643 GetTopTreeScoreWithProposedNNI).  Each
proposed NNI is scored by a fixed-shape program over five local edges:
rootward + leafward passes over [4, S] partial vectors, then
`optimize_max_iter` rounds of serial Brent line searches in log-branch-length
space over the slots (left, right, sister, central, parent), then the
focal-edge log likelihood.  This module translates that program — including
the reference's Boost-adapted guess-init Brent
(src/optimization.hpp:70-188) as a `lax.while_loop` with per-lane stop
masks — into JAX and vmaps it over candidates, so a whole adjacent-NNI set
scores in one dispatch instead of a host-side Python loop.

Numerical contract: in f64 this follows the exact update sequence of
`FaithfulTPEvalEngine.score_proposed_nni` (eval_engine.py); agreement is at
the reassociation level of XLA-vs-numpy reductions (≤ ~1e-12 relative on
DS1), verified by tests/test_batch_scorer.py and by the DS1 golden-run
prefix staying exact with the batched path enabled.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .eval_engine import (
    A_FOCAL,
    A_LEFT,
    A_PARENT,
    A_RIGHT,
    A_SISTER,
    BL_DIFF_THRESHOLD,
    BRENT_MAX_ITER,
    JC69_EIGENVALUES,
    JC69_V,
    JC69_VINV,
    MAX_LOG_BL,
    MIN_LOG_BL,
    SIGNIFICANT_DIGITS,
)

Precision = jax.lax.Precision.HIGHEST

_GOLDEN = 0.3819659948348999  # float32 of the reference's 0.3819660f


def _transition(bl, V, lam, Vinv):
    """P(t) = V diag(exp(t*lambda)) V^-1 (reference
    SetTransitionMatrixToHaveBranchLength, tp_evaluation_engine.cpp:1223)."""
    return jnp.dot(V * jnp.exp(bl * lam), Vinv, precision=Precision)


def _brent_minimize(f, guess, lo0, hi0, max_iter=BRENT_MAX_ITER,
                    significant_digits=SIGNIFICANT_DIGITS, active=None):
    """Traced replica of eval_engine.brent_minimize_scalar (itself the
    reference Optimization::BrentMinimize, src/optimization.hpp:70-188).

    Implemented as a `lax.while_loop` whose body reproduces one serial
    iteration exactly; under vmap each lane stops via its own `done` flag
    while stalled lanes hold state, so per-lane trajectories match the
    scalar loop step for step.

    `active=False` lanes start done and return (guess, f(guess))
    untouched: callers whose result would be masked off anyway (slots with
    fixed branch lengths under fix_proposed_bls_from_dag, bucket padding
    lanes) then contribute zero iterations to the batched while_loop
    instead of running a full masked-out line search — in the DS1 golden
    run only the new focal edge typically optimizes, so this removes most
    of the Brent work from the candidate-scoring dispatch."""
    tolerance = jnp.ldexp(jnp.asarray(1.0, guess.dtype), 1 - significant_digits)
    x = w = v = guess
    fx = f(x)
    done0 = (jnp.asarray(False) if active is None
             else ~jnp.asarray(active))
    state = (x, w, v, fx, fx, fx,
             jnp.zeros_like(x), jnp.zeros_like(x), lo0, hi0,
             jnp.asarray(max_iter, jnp.int32), done0)

    def cond(st):
        return ~st[11]

    def body(st):
        x, w, v, fx, fw, fv, delta, delta2, lo, hi, count, done = st
        mid = (lo + hi) / 2.0
        fract1 = tolerance * jnp.abs(x) + tolerance / 4.0
        fract2 = 2.0 * fract1
        stop = jnp.abs(x - mid) <= (fract2 - (hi - lo) / 2.0)

        # Parabolic interpolation attempt (guarded where the serial code
        # would not evaluate it).
        r = (x - w) * (fx - fv)
        q = (x - v) * (fx - fw)
        p = (x - v) * q - (x - w) * r
        q = 2.0 * (q - r)
        p = jnp.where(q > 0, -p, p)
        q = jnp.abs(q)
        td = delta2
        interp_ok = (
            (jnp.abs(delta2) > fract1)
            & ~(jnp.abs(p) >= jnp.abs(q * td / 2.0))
            & ~(p <= q * (lo - x))
            & ~(p >= q * (hi - x))
        )
        q_safe = jnp.where(q == 0.0, 1.0, q)
        delta_cand = p / q_safe
        u_cand = x + delta_cand
        near_end = ((u_cand - lo) < fract2) | ((hi - u_cand) < fract2)
        delta_interp = jnp.where(
            near_end,
            jnp.where(mid - x < 0, -jnp.abs(fract1), jnp.abs(fract1)),
            delta_cand,
        )
        delta2_bis = jnp.where(x >= mid, lo - x, hi - x)
        new_delta2 = jnp.where(interp_ok, delta, delta2_bis)
        new_delta = jnp.where(interp_ok, delta_interp, _GOLDEN * delta2_bis)
        u = jnp.where(
            jnp.abs(new_delta) >= fract1,
            x + new_delta,
            jnp.where(new_delta > 0, x + jnp.abs(fract1),
                      x - jnp.abs(fract1)),
        )
        fu = f(u)
        improved = fu <= fx
        lo_n = jnp.where(improved, jnp.where(u >= x, x, lo),
                         jnp.where(u < x, u, lo))
        hi_n = jnp.where(improved, jnp.where(u >= x, hi, x),
                         jnp.where(u < x, hi, u))
        # v,w,x bookkeeping (the serial else-branch's two sub-cases).
        case_w = (fu <= fw) | (w == x)
        case_v = (fu <= fv) | (v == x) | (v == w)
        v_n = jnp.where(improved, w, jnp.where(case_w, w,
                                               jnp.where(case_v, u, v)))
        fv_n = jnp.where(improved, fw, jnp.where(case_w, fw,
                                                 jnp.where(case_v, fu, fv)))
        w_n = jnp.where(improved, x, jnp.where(case_w, u, w))
        fw_n = jnp.where(improved, fx, jnp.where(case_w, fu, fw))
        x_n = jnp.where(improved, u, x)
        fx_n = jnp.where(improved, fu, fx)
        count_n = count - 1

        keep = lambda old, new: jnp.where(stop, old, new)
        return (
            keep(x, x_n), keep(w, w_n), keep(v, v_n),
            keep(fx, fx_n), keep(fw, fw_n), keep(fv, fv_n),
            keep(delta, new_delta), keep(delta2, new_delta2),
            keep(lo, lo_n), keep(hi, hi_n),
            jnp.where(stop, count, count_n),
            stop | (count_n == 0),
        )

    out = jax.lax.while_loop(cond, body, state)
    return out[0], out[3]


def _score_one(sister_p, left_p, right_p, parent_rhat_in, gp_rfocal, has_gp,
               bl0, do_opt, rootsplit, weights, V, lam, Vinv,
               optimize_max_iter: int, do_optimize: bool):
    """One proposed-NNI score; mirrors
    FaithfulTPEvalEngine.score_proposed_nni statement for statement."""
    P_of = lambda b: _transition(b, V, lam, Vinv)

    def make_neg_ll(ppv, cpv):
        """JC69 closed-form Brent objective: P(t) = 1/4 + (I - 1/4)
        e^{-4t/3}, so the per-site values collapse to c0 + c1 e^{-4t/3}
        with c0/c1 precomputed once per slot.  Inside the line search this
        replaces a [4,4] matrix build + [4,4]@[4,S] dot + einsum per
        evaluation with one scalar exp and one fused multiply-add over
        sites — the candidate-scoring dispatch is the search's hot loop
        (reference src/nni_engine.cpp:230-257) and its cost is these
        evaluations.  Algebraically identical to the matrix form; the
        different rounding shifts converged scores at ~1e-12, within every
        golden tolerance (tests/test_batch_scorer.py pins the batched-vs-
        serial agreement)."""
        c0 = 0.25 * jnp.sum(ppv, axis=0) * jnp.sum(cpv, axis=0)
        c1 = jnp.einsum("as,as->s", ppv, cpv, precision=Precision) - c0

        def f(y):
            u = jnp.exp(-4.0 / 3.0 * jnp.exp(y))
            return -jnp.dot(jnp.log(c0 + c1 * u), weights,
                            precision=Precision)

        return f

    def brent_slot(bl, diffs, slot, ppv, cpv, check, extra=True):
        obj = make_neg_ll(ppv, cpv)
        cur_y = jnp.log(bl[slot])
        cur_f = obj(cur_y)
        run = do_opt[slot] & extra & (~check | (diffs[slot]
                                                >= BL_DIFF_THRESHOLD))
        y, fy = _brent_minimize(obj, cur_y,
                                jnp.full_like(cur_y, MIN_LOG_BL),
                                jnp.full_like(cur_y, MAX_LOG_BL),
                                active=run)
        new_bl = jnp.where(fy > cur_f, jnp.exp(cur_y), jnp.exp(y))
        diffs = diffs.at[slot].set(
            jnp.where(run, jnp.abs(jnp.exp(cur_y) - new_bl), diffs[slot]))
        bl = bl.at[slot].set(jnp.where(run, new_bl, bl[slot]))
        return bl, diffs

    def rootward(bl):
        cpl = jnp.dot(P_of(bl[A_LEFT]), left_p, precision=Precision)
        cpr = jnp.dot(P_of(bl[A_RIGHT]), right_p, precision=Precision)
        cp = cpl * cpr
        pps = jnp.dot(P_of(bl[A_SISTER]), sister_p, precision=Precision)
        ppf = jnp.dot(P_of(bl[A_FOCAL]), cp, precision=Precision)
        return cpl, cpr, cp, pps, ppf

    def leafward(bl, pps, ppf, cpl, cpr):
        prhat = jnp.where(
            has_gp,
            jnp.dot(P_of(bl[A_PARENT]), gp_rfocal, precision=Precision),
            parent_rhat_in,
        )
        prf = prhat * pps
        crhat = jnp.dot(P_of(bl[A_FOCAL]), prf, precision=Precision)
        return prhat, prf, crhat

    bl = bl0
    diffs = jnp.zeros_like(bl0)
    cpl, cpr, cp, pps, ppf = rootward(bl)
    prhat, prf, crhat = leafward(bl, pps, ppf, cpl, cpr)

    if do_optimize:
        for it in range(optimize_max_iter):
            check = jnp.asarray(it > 0)
            # OptimizeLeftChild (tp_evaluation_engine.cpp:571-579)
            child_rleft = crhat * cpr
            bl, diffs = brent_slot(bl, diffs, A_LEFT, child_rleft, left_p,
                                   check)
            cpl = jnp.dot(P_of(bl[A_LEFT]), left_p, precision=Precision)
            cp = cpl * cpr
            # OptimizeRightChild
            child_rright = crhat * cpl
            bl, diffs = brent_slot(bl, diffs, A_RIGHT, child_rright, right_p,
                                   check)
            cpr = jnp.dot(P_of(bl[A_RIGHT]), right_p, precision=Precision)
            cp = cpr * cpl
            # OptimizeSister
            parent_rsister = prhat * ppf
            bl, diffs = brent_slot(bl, diffs, A_SISTER, parent_rsister,
                                   sister_p, check)
            pps = jnp.dot(P_of(bl[A_SISTER]), sister_p, precision=Precision)
            # OptimizeCentral
            cp = cpl * cpr
            prf = prhat * pps
            bl, diffs = brent_slot(bl, diffs, A_FOCAL, prf, cp, check)
            ppf = jnp.dot(P_of(bl[A_FOCAL]), cp, precision=Precision)
            # OptimizeParent — skipped for rootsplit parents / absent
            # grandparent (eval_engine.py:759-766).
            parent_p = ppf * pps
            bl, diffs = brent_slot(bl, diffs, A_PARENT, gp_rfocal, parent_p,
                                   check, extra=(~rootsplit) & has_gp)
            cpl, cpr, cp, pps, ppf = rootward(bl)
            prhat, prf, crhat = leafward(bl, pps, ppf, cpl, cpr)

    vals = jnp.einsum(
        "as,as->s", prf,
        jnp.dot(P_of(bl[A_FOCAL]), cp, precision=Precision),
        precision=Precision)
    return jnp.dot(jnp.log(vals), weights, precision=Precision)


@functools.partial(jax.jit, static_argnames=("optimize_max_iter",
                                             "do_optimize"))
def _score_batch(sister_p, left_p, right_p, parent_rhat, gp_rfocal, has_gp,
                 bl0, do_opt, rootsplit, weights, V, lam, Vinv,
                 *, optimize_max_iter: int, do_optimize: bool):
    fn = functools.partial(_score_one, optimize_max_iter=optimize_max_iter,
                           do_optimize=do_optimize)
    return jax.vmap(
        fn, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None, None, None, None)
    )(sister_p, left_p, right_p, parent_rhat, gp_rfocal, has_gp, bl0,
      do_opt, rootsplit, weights, V, lam, Vinv)


def _bucket(n: int) -> int:
    """Candidate-count buckets so the jitted program compiles per bucket,
    not per NNI iteration."""
    b = 4
    while b < n:
        b = b * 2 if b < 64 else b + 64
    return b


def score_proposed_nnis_batched(
    engine, posts: Sequence[Tuple], best_edge_map: Optional[Dict[str, int]]
) -> np.ndarray:
    """Score a set of proposed NNIs as one vmapped XLA dispatch.

    `engine` is a FaithfulTPEvalEngine; host-side candidate prep (choice-map
    remapping, best-edge lookup, PV gathering) reuses its
    `_proposed_nni_inputs`, and the compute — 5-slot Brent optimization plus
    the focal-edge likelihood — runs on device for all candidates at once.
    Returns scores in `posts` order, matching `score_proposed_nni` serial
    results to f64 reassociation tolerance.
    """
    C = len(posts)
    if C == 0:
        return np.zeros(0)
    S = engine.site_pattern.pattern_count
    CB = _bucket(C)
    # Padding lanes (and absent grandparents) get uniform PVs so their
    # masked-out Brent lanes converge immediately instead of chasing
    # log(0) = -inf objectives to the iteration cap.
    sister = np.full((CB, 4, S), 0.25)
    left = np.full((CB, 4, S), 0.25)
    right = np.full((CB, 4, S), 0.25)
    prhat = np.full((CB, 4, S), 0.25)
    gp = np.full((CB, 4, S), 0.25)
    has_gp = np.zeros(CB, dtype=bool)
    bl0 = np.full((CB, 5), 0.1)
    do_opt = np.zeros((CB, 5), dtype=bool)
    rootsplit = np.zeros(CB, dtype=bool)
    for i, post in enumerate(posts):
        refs, bl_i, do_i, _pre, _adj = engine._proposed_nni_inputs(
            post, best_edge_map if engine.use_best_edge_map else None)
        sister[i] = refs.sister_p
        left[i] = refs.leftchild_p
        right[i] = refs.rightchild_p
        prhat[i] = refs.parent_rhat
        if refs.grandparent_rfocal is not None:
            gp[i] = refs.grandparent_rfocal
            has_gp[i] = True
        bl0[i] = bl_i
        do_opt[i] = do_i
        rootsplit[i] = post[0].is_rootsplit()
    scores = _score_batch(
        jnp.asarray(sister), jnp.asarray(left), jnp.asarray(right),
        jnp.asarray(prhat), jnp.asarray(gp), jnp.asarray(has_gp),
        jnp.asarray(bl0), jnp.asarray(do_opt), jnp.asarray(rootsplit),
        jnp.asarray(engine.weights),
        jnp.asarray(JC69_V), jnp.asarray(JC69_EIGENVALUES),
        jnp.asarray(JC69_VINV),
        optimize_max_iter=engine.optimize_max_iter,
        do_optimize=engine.do_optimize_new_edges,
    )
    return np.asarray(scores)[:C]
