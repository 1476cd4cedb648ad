"""Device-side SBN training and topology gradients.

XLA rebuilds of the EM loop (reference SBNProbability::ExpectationMaximization,
src/sbn_probability.cpp:214-331) and of GradientOfLogQ / TopologyGradients
(reference src/unrooted_sbn_instance.cpp:170-240).  Where the numpy versions
in probability.py / gradients.py walk python dicts per topology, these pack
everything into static index tensors once per support and run the math as
segment reductions on device:

  - per-parent-range normalization  -> segment_max / segment_sum over seg_id
  - EM E-step softmax over rootings -> one [T, R] logsumexp
  - EM M-step log-space scatter-add -> exp-shift + segment_sum over indices
  - GradientOfLogQ touched ranges   -> static child_seg/childrot_seg gathers
    (the reference's GetSubsplitRanges becomes two per-index table lookups:
    the ranges of a rooted tree are exactly {rootsplit range} plus both
    orientations of index_to_child[idx] for every idx in the representation,
    src/generic_sbn_instance.hpp:449-462)

The EM while_loop replicates the reference's control flow: score recorded
every iteration, break when |relative improvement| < score_epsilon after the
first iteration.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .support import SBNSupport

NEG_INF = -np.inf


# ---------------------------------------------------------------------------
# Static per-support index tensors


class SupportArrays:
    """Index tensors derived from an SBNSupport, built once and cached on the
    support object."""

    def __init__(self, support: SBNSupport):
        size = support.size()
        segs = support.segments()
        seg_id = np.full(size, -1, dtype=np.int32)
        range_to_seg = {}
        for g, (s, e) in enumerate(segs):
            seg_id[s:e] = g
            range_to_seg[(s, e)] = g
        assert (seg_id >= 0).all(), "segments must partition the support"
        child_seg = np.full(size, -1, dtype=np.int32)
        childrot_seg = np.full(size, -1, dtype=np.int32)
        for i, child in enumerate(support.index_to_child):
            rng = support.parent_to_range.get(child.to_string())
            if rng is not None:
                child_seg[i] = range_to_seg[rng]
            rng = support.parent_to_range.get(child.rotate().to_string())
            if rng is not None:
                childrot_seg[i] = range_to_seg[rng]
        self.size = size
        self.num_segments = len(segs)
        self.seg_id = seg_id
        self.child_seg = child_seg
        self.childrot_seg = childrot_seg
        # Segment id of the rootsplit range (always segment 0 by the
        # segments() ordering).
        self.rootsplit_seg = 0


def support_arrays(support: SBNSupport) -> SupportArrays:
    arrays = getattr(support, "_device_arrays", None)
    if arrays is None or arrays.size != support.size():
        arrays = SupportArrays(support)
        support._device_arrays = arrays
    return arrays


def pack_unrooted(representations, size: int) -> np.ndarray:
    """[n_topologies, n_rootings, L] int32 index tensor padded with -1.
    Out-of-support entries (reference sentinel == size) are kept as `size`
    so callers can invalidate whole rootings."""
    n_topo = len(representations)
    n_root = max(len(r) for r in representations)
    L = max(len(rr) for r in representations for rr in r)
    arr = np.full((n_topo, n_root, L), -1, dtype=np.int32)
    for i, rep in enumerate(representations):
        for j, rooted in enumerate(rep):
            arr[i, j, : len(rooted)] = rooted
    return arr


# ---------------------------------------------------------------------------
# Normalization


def _normalize_in_log(params, seg_id, num_segments):
    """Per-segment log normalization (reference
    ProbabilityNormalizeParamsInLog, src/sbn_probability.cpp:135-144).
    Segments that are entirely -inf stay -inf."""
    m = jax.ops.segment_max(params, seg_id, num_segments=num_segments)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    z = jax.ops.segment_sum(
        jnp.exp(params - m_safe[seg_id]), seg_id, num_segments=num_segments
    )
    lse = jnp.where(jnp.isfinite(m), jnp.log(z) + m_safe, m)
    lse_i = lse[seg_id]
    return jnp.where(jnp.isfinite(lse_i), params - lse_i, NEG_INF)


# ---------------------------------------------------------------------------
# Expectation maximization


def _em_kernel(reps, counts, log_m_tilde, seg_id, alpha, score_epsilon,
               max_iter: int, num_segments: int):
    size = seg_id.shape[0]
    n_topo, n_root, L = reps.shape
    dtype = log_m_tilde.dtype

    valid = reps >= 0
    safe = jnp.where(valid, reps, 0)
    row_valid = valid.any(axis=-1)
    flat_idx = jnp.where(valid, reps, size).reshape(-1)
    log_counts = jnp.log(counts)

    # Starting point: normalized mean-over-rootings counts
    # (src/sbn_probability.cpp:242-247); the alpha>0 regularizer keeps the
    # unnormalized log m_tilde + log alpha.
    log_m_tilde0 = log_m_tilde - jnp.log(jnp.asarray(n_root, dtype))
    sbn0 = _normalize_in_log(log_m_tilde0, seg_id, num_segments)
    use_alpha = alpha > 0.0
    log_m_tilde_a = jnp.where(
        use_alpha, log_m_tilde0 + jnp.log(jnp.where(use_alpha, alpha, 1.0)),
        NEG_INF,
    )
    m_tilde_exp = jnp.where(use_alpha, jnp.exp(log_m_tilde_a), 0.0)

    def body(state):
        i, sbn, prev_score, done, history = state
        padded = jnp.concatenate([sbn, jnp.zeros((1,), dtype)])
        entry = jnp.where(valid, padded[safe], 0.0)
        log_p_rooted = jnp.where(row_valid, entry.sum(axis=-1), NEG_INF)
        row_max = jnp.max(log_p_rooted, axis=1)
        row_max_safe = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
        log_p_unrooted = (
            jnp.log(jnp.sum(jnp.exp(log_p_rooted - row_max_safe[:, None]),
                            axis=1))
            + row_max_safe
        )
        score = jnp.sum(counts * log_p_unrooted)
        # E-step weights, M-step scatter-add (log space via a global shift:
        # log_q <= max log_counts so exp never overflows; underflow drops
        # negligible mass exactly as the reference's logaddexp does).
        log_q = (log_p_rooted - log_p_unrooted[:, None]
                 + log_counts[:, None])
        shift = jnp.max(jnp.where(jnp.isfinite(log_q), log_q, NEG_INF))
        w = jnp.where(jnp.isfinite(log_q), jnp.exp(log_q - shift), 0.0)
        contrib = jnp.broadcast_to(
            w[:, :, None], (n_topo, n_root, L)
        ).reshape(-1)
        m_lin = jax.ops.segment_sum(contrib, flat_idx, num_segments=size + 1)
        m_lin = m_lin[:size]
        log_m_bar = jnp.where(m_lin > 0.0, jnp.log(m_lin) + shift, NEG_INF)
        sbn_new = _normalize_in_log(
            jnp.logaddexp(log_m_bar, log_m_tilde_a), seg_id, num_segments
        )
        reg = jnp.sum(jnp.where(m_tilde_exp > 0.0, m_tilde_exp * sbn_new, 0.0))
        score = score + reg
        history = history.at[i].set(score)
        imp = (score - prev_score) / jnp.abs(prev_score)
        done = (i > 0) & (jnp.abs(imp) < score_epsilon)
        return i + 1, sbn_new, score, done, history

    def cond(state):
        i, _, _, done, _ = state
        return (i < max_iter) & ~done

    history0 = jnp.full((max_iter,), jnp.nan, dtype)
    i, sbn, _, _, history = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), sbn0, jnp.asarray(0.0, dtype), False,
                     history0)
    )
    return sbn, history, i


_em_jit = jax.jit(_em_kernel, static_argnames=("max_iter", "num_segments"))


def expectation_maximization(
    support: SBNSupport,
    representations,
    counts: Sequence[int],
    alpha: float,
    max_iter: int,
    score_epsilon: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Device-side SBN-EM; same contract as
    probability.expectation_maximization."""
    from . import probability

    arrays = support_arrays(support)
    reps = pack_unrooted(representations, support.size())
    counts = np.asarray(list(counts), dtype=np.float64)
    log_m_tilde = probability.set_log_counts(support, representations, counts)
    sbn, history, n = _em_jit(
        jnp.asarray(reps), jnp.asarray(counts), jnp.asarray(log_m_tilde),
        jnp.asarray(arrays.seg_id), float(alpha), float(score_epsilon),
        max_iter=int(max_iter), num_segments=arrays.num_segments,
    )
    n = int(n)
    history = np.asarray(history)[:n]
    if n > 1:
        imp = np.diff(history) / np.abs(history[:-1])
        # Tolerance scales with the score dtype: 1e-10 assumes f64; f32
        # score noise is ~1e-6 relative.
        tol = 1e-10 if history.dtype == np.float64 else 1e-5
        assert (imp > -tol).all(), "EM score decreased"
    return np.asarray(sbn), history


# ---------------------------------------------------------------------------
# Topology gradients (GradientOfLogQ)


def _topology_gradients_kernel(reps, factors, params, seg_id, child_seg,
                               childrot_seg, num_segments: int):
    """grad = sum_t factor_t * d log q(tau_t) / d phi, fully vectorized.

    Per rooting r of topology t with P(rooted) p_{t,r} and q_t = sum_r p_{t,r}
    (reference GradientOfLogQ): the gradient contribution is
    scale_{t,r} * (indicator over rep indices - softmax over touched ranges)
    with scale_{t,r} = factor_t * p_{t,r} / q_t.  Touched ranges per rooting
    are segment 0 plus child_seg/childrot_seg of every rep index; each range
    is touched at most once per rooting (each subsplit appears once per
    rooted tree), and each in-tree index lies in exactly one touched range,
    so plain segment sums reproduce the reference's per-range loop."""
    size = seg_id.shape[0]
    n_topo, n_root, L = reps.shape
    dtype = params.dtype

    in_support = (reps >= 0) & (reps < size)
    present = reps >= 0
    # A rooting is usable iff every present index is in support
    # (reference skips rootings containing the out-of-support sentinel).
    row_valid = present.any(-1) & ~(present & ~in_support).any(-1)
    safe = jnp.where(in_support, reps, 0)

    norm = _normalize_in_log(params, seg_id, num_segments)
    exp_norm = jnp.where(jnp.isfinite(norm), jnp.exp(norm), 0.0)
    padded = jnp.concatenate([norm, jnp.zeros((1,), dtype)])
    entry = jnp.where(in_support, padded[safe], 0.0)
    log_p_rooted = jnp.where(row_valid, entry.sum(-1), NEG_INF)  # [T, R]
    row_max = jnp.max(log_p_rooted, axis=1)
    row_max_safe = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    log_q = (jnp.log(jnp.sum(jnp.exp(log_p_rooted - row_max_safe[:, None]),
                             axis=1)) + row_max_safe)          # [T]
    scale = jnp.where(
        jnp.isfinite(log_p_rooted) & jnp.isfinite(log_q)[:, None],
        jnp.exp(log_p_rooted - log_q[:, None]), 0.0
    ) * factors[:, None]                                        # [T, R]

    # Indicator part: + scale at every in-tree index.
    flat_idx = jnp.where(in_support, reps, size).reshape(-1)
    contrib = jnp.broadcast_to(scale[:, :, None],
                               (n_topo, n_root, L)).reshape(-1)
    grad = jax.ops.segment_sum(contrib, flat_idx,
                               num_segments=size + 1)[:size]

    # Softmax part: - (total touched weight per segment) * exp(norm).
    seg_gather = jnp.stack(
        [child_seg[safe], childrot_seg[safe]], axis=-1)        # [T,R,L,2]
    seg_ok = in_support[..., None] & (seg_gather >= 0)
    seg_safe = jnp.where(seg_ok, seg_gather, num_segments)
    seg_contrib = jnp.where(seg_ok, scale[:, :, None, None], 0.0)
    seg_w = jax.ops.segment_sum(
        seg_contrib.reshape(-1), seg_safe.reshape(-1),
        num_segments=num_segments + 1,
    )[:num_segments]
    # Rootsplit range (segment 0) is touched once per valid rooting.
    seg_w = seg_w.at[0].add(jnp.sum(scale * row_valid))
    grad = grad - seg_w[seg_id] * exp_norm
    return grad


_topo_grad_jit = jax.jit(_topology_gradients_kernel,
                         static_argnames=("num_segments",))


def topology_gradients(
    support: SBNSupport,
    sbn_parameters: np.ndarray,
    unrooted_reps,
    log_f: np.ndarray,
    use_vimco: bool = True,
) -> np.ndarray:
    """Device-side UnrootedSBNInstance::TopologyGradients
    (reference src/unrooted_sbn_instance.cpp:216-240)."""
    from . import gradients

    arrays = support_arrays(support)
    reps = pack_unrooted(unrooted_reps, support.size())
    factors = (gradients.vimco_multiplicative_factors(log_f) if use_vimco
               else gradients.multiplicative_factors(log_f))
    grad = _topo_grad_jit(
        jnp.asarray(reps), jnp.asarray(factors),
        jnp.asarray(np.asarray(sbn_parameters, dtype=np.float64)),
        jnp.asarray(arrays.seg_id), jnp.asarray(arrays.child_seg),
        jnp.asarray(arrays.childrot_seg),
        num_segments=arrays.num_segments,
    )
    return np.asarray(grad)
