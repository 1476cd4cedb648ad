"""GP engine: generalized pruning on the subsplit DAG as levelized XLA
wavefront programs.

TPU-native rebuild of the reference GPEngine
(reference: src/gp_engine.cpp:213-816, src/gp_engine.hpp:287-377).  The
mmapped per-node PLV store becomes one HBM-resident tensor
  plv[6, N, 4, S]   (P, PHatRight, PHatLeft, RHat, RRight, RLeft)
with per-(PLV, site) log rescaling offsets
  ls[6, N, S]
replacing the reference's threshold-triggered per-PLV scaler counts
(src/gp_engine.cpp:564-601) with exact per-site scale bookkeeping.

The serial GPOperation tape (src/gp_dag.cpp:260-304) becomes one batched
gather -> q-weighted 4x4 matvec -> scatter-add per DAG level; branch-length
optimization runs whole levels of independent Brent line searches at once
(replacing the per-edge serial Brent of src/gp_engine.cpp:603-654).

Like the reference engine, the substitution model is JC69 with four states
(src/gp_engine.hpp:362-377).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.site_pattern import SitePattern
from ..dag.schedule import (
    GPSchedule,
    LevelEntries,
    P,
    PHAT_RIGHT,
    PHAT_LEFT,
    RHAT,
    RRIGHT,
    RLEFT,
    build_schedule,
)
from ..dag.subsplit_dag import LEFT, RIGHT, SubsplitDAG
from . import optimize

Precision = jax.lax.Precision.HIGHEST

MIN_LOG_BL = -13.9       # reference src/dag_branch_handler.hpp:272
MAX_LOG_BL = 1.1         # reference src/dag_branch_handler.hpp:275
DEFAULT_BL = 0.1         # reference src/dag_branch_handler.hpp:266


def jc69_transition(t: jnp.ndarray) -> jnp.ndarray:
    """JC69 P(t): 0.25(1-e) off-diagonal + e on the diagonal with
    e = exp(-4t/3) (reference src/gp_engine.cpp:341-350 via eigendecomp).
    Symmetric, so it serves both rootward and leafward evolution."""
    e = jnp.exp(-4.0 * t / 3.0)
    eye = jnp.eye(4, dtype=t.dtype)
    return 0.25 * (1.0 - e)[..., None, None] + e[..., None, None] * eye


def jc69_transition_derivative(t: jnp.ndarray) -> jnp.ndarray:
    e = jnp.exp(-4.0 * t / 3.0) * (-4.0 / 3.0)
    eye = jnp.eye(4, dtype=t.dtype)
    return -0.25 * e[..., None, None] + e[..., None, None] * eye


def _pad_stack(arrays: List[np.ndarray], pad_value: int,
               dtype=np.int32) -> np.ndarray:
    """Stack variable-length 1-D index arrays into [L, W] with padding.

    Padding rows index dummy slots (node N / edge E) so a single traced
    scan body serves every level — the XLA program size becomes
    independent of the DAG's level count (vs the per-level python unroll,
    whose first compile grew linearly with DAG depth)."""
    W = max([len(a) for a in arrays] + [1])
    out = np.full((len(arrays), W), pad_value, dtype=dtype)
    for i, a in enumerate(arrays):
        out[i, : len(a)] = a
    return out


class GPEngine:
    def __init__(self, site_pattern: SitePattern, dag: SubsplitDAG,
                 dtype=None, optimization_method: str = "brent"):
        self.site_pattern = site_pattern
        self.dag = dag
        self.optimization_method = optimization_method
        self.dtype = dtype or jnp.zeros(0).dtype
        self.schedule = build_schedule(dag)
        S0 = site_pattern.pattern_count
        self.S = S0  # patterns kept unpadded here; pad when sharding
        tips = site_pattern.tip_partials().astype(np.float64)  # [n, S, 4]
        self.tips = jnp.asarray(np.swapaxes(tips, 1, 2), dtype=self.dtype)
        self.weights = jnp.asarray(site_pattern.weights, dtype=self.dtype)
        # Priors (reference GPInstance::MakeGPEngine, src/gp_instance.cpp:146)
        self.sbn_prior = dag.build_uniform_on_topological_support_prior()
        node_probs = dag.unconditional_node_probabilities(self.sbn_prior)
        self.unconditional_node_probabilities = node_probs[
            : dag.node_count_without_dag_root()
        ]
        self.inverted_sbn_prior = dag.inverted_gpcsp_probabilities(
            self.sbn_prior, node_probs
        )
        # Mutable engine state
        self.q = jnp.asarray(self.sbn_prior, dtype=self.dtype)
        self.branch_lengths = jnp.full(
            (self.schedule.edge_count,), DEFAULT_BL, dtype=self.dtype
        )
        self.branch_length_differences = jnp.zeros_like(self.branch_lengths)
        self.plv: Optional[jnp.ndarray] = None
        self.ls: Optional[jnp.ndarray] = None
        self.per_edge_ll: Optional[jnp.ndarray] = None
        self.log_marginal_site: Optional[jnp.ndarray] = None
        self.hybrid_marginal_log_likelihoods = np.full(
            self.schedule.edge_count, -np.inf
        )
        self._build_programs()

    # ------------------------------------------------------------------
    # program construction (closures over the static schedule arrays)
    # ------------------------------------------------------------------
    def _build_programs(self):
        sch = self.schedule
        N = sch.node_count
        Np1 = N + 1                     # slot N is the dummy (padding) node
        E = sch.edge_count              # slot E is the dummy (padding) edge
        n_taxa = sch.taxon_count
        S = self.S
        dtype = self.dtype
        NEG = jnp.asarray(-jnp.inf, dtype)

        def accumulate(plv, ls, edge, dest, src, src_plv, trans_all, q_ext,
                       dest_plv):
            """Scatter-accumulate q-weighted evolved PLVs into fresh dest
            slots, aligning per-site scales to the per-dest max.  Padding
            entries carry q_ext[E] == 0 and dest == N, so they contribute
            zero and land in the dummy slot."""
            src_vals = plv[src_plv, src]          # [K, 4, S]
            src_ls = ls[src_plv, src]             # [K, S]
            key = dest_plv * Np1 + dest           # [K] flat (plv_type, node)
            ls_max = jnp.full((6 * Np1, S), NEG).at[key].max(src_ls)
            factor = jnp.exp(src_ls - ls_max[key])
            contrib = (
                q_ext[edge][:, None, None]
                * jnp.einsum("kab,kbs->kas", trans_all[edge], src_vals,
                             precision=Precision)
                * factor[:, None, :]
            )
            acc = jnp.zeros((6 * Np1, 4, S), dtype).at[key].add(contrib)
            return acc.reshape(6, Np1, 4, S), jnp.where(
                jnp.isfinite(ls_max), ls_max, 0.0
            ).reshape(6, Np1, S)

        def write_levels(plv, ls, acc, acc_ls, plv_types, nodes):
            for ptype in plv_types:
                plv = plv.at[ptype, nodes].set(acc[ptype, nodes])
                ls = ls.at[ptype, nodes].set(acc_ls[ptype, nodes])
            return plv, ls

        def multiply_rescale(plv, ls, dest, src1, src2, nodes):
            prod = plv[src1, nodes] * plv[src2, nodes]
            lsn = ls[src1, nodes] + ls[src2, nodes]
            m = prod.max(axis=1)                  # [M, S]
            m_safe = jnp.where(m > 0, m, 1.0)
            plv = plv.at[dest, nodes].set(prod / m_safe[:, None, :])
            ls = ls.at[dest, nodes].set(lsn + jnp.log(m_safe))
            return plv, ls

        rootsplit_nodes = jnp.asarray(sch.rootsplit_nodes)
        rootsplit_edges = jnp.asarray(sch.rootsplit_edges)

        # -- stacked (padded) per-level index tensors ----------------------
        # One lax.scan body serves every level; the traced program size is
        # independent of DAG depth (the per-level unroll compiled in O(depth)
        # and took minutes on deep DAGs).
        def stack_entries(levels: List[LevelEntries]):
            return dict(
                edge=jnp.asarray(_pad_stack([l.edge for l in levels], E)),
                dest=jnp.asarray(_pad_stack([l.dest for l in levels], N)),
                side=jnp.asarray(_pad_stack(
                    [l.dest_side.astype(np.int32) for l in levels], 0)),
                src=jnp.asarray(_pad_stack([l.src for l in levels], N)),
                src_plv=jnp.asarray(_pad_stack([l.src_plv for l in levels],
                                               0)),
                nodes=jnp.asarray(_pad_stack([l.nodes for l in levels], N)),
            )

        rw = stack_entries(sch.rootward) if sch.rootward else None
        lw = stack_entries(sch.leafward)
        # Leafward level 0 (the rootsplits) receives no accumulation: its
        # RHat is seeded from the stationary distribution, so its acc write
        # targets only the dummy node.
        lw["acc_nodes"] = jnp.asarray(_pad_stack(
            [np.zeros(0, dtype=np.int32)]
            + [l.nodes for l in sch.leafward[1:]], N,
        ))

        def ext(bl, q):
            bl_ext = jnp.concatenate(
                [bl, jnp.full((1,), DEFAULT_BL, dtype)]
            )
            q_ext = jnp.concatenate([q, jnp.zeros((1,), dtype)])
            return bl_ext, q_ext

        def seed_rhat(plv, ls, q):
            # Seed rootsplits' RHat with q * stationary (reference
            # SetToStationaryDistribution, src/gp_engine.cpp:218).
            rhat_root = jnp.broadcast_to(
                (q[rootsplit_edges] * 0.25)[:, None, None],
                (len(sch.rootsplit_nodes), 4, S),
            )
            plv = plv.at[RHAT, rootsplit_nodes].set(rhat_root)
            ls = ls.at[RHAT, rootsplit_nodes].set(0.0)
            return plv, ls

        def populate(bl, q, tips):
            bl_ext, q_ext = ext(bl, q)
            trans = jc69_transition(bl_ext)       # [E+1, 4, 4]
            plv = jnp.zeros((6, Np1, 4, S), dtype)
            ls = jnp.zeros((6, Np1, S), dtype)
            plv = plv.at[P, :n_taxa].set(tips)

            # Rootward: phat accumulation + P multiply per level.
            def root_body(carry, lvl):
                plv, ls = carry
                dest_plv = jnp.where(lvl["side"], PHAT_LEFT, PHAT_RIGHT)
                acc, acc_ls = accumulate(plv, ls, lvl["edge"], lvl["dest"],
                                         lvl["src"], lvl["src_plv"], trans,
                                         q_ext, dest_plv)
                plv, ls = write_levels(plv, ls, acc, acc_ls,
                                       (PHAT_RIGHT, PHAT_LEFT), lvl["nodes"])
                plv, ls = multiply_rescale(plv, ls, P, PHAT_LEFT, PHAT_RIGHT,
                                           lvl["nodes"])
                return (plv, ls), None

            if rw is not None:
                (plv, ls), _ = jax.lax.scan(root_body, (plv, ls), rw)
            plv, ls = seed_rhat(plv, ls, q)

            def leaf_body(carry, lvl):
                plv, ls = carry
                dest_plv = jnp.full_like(lvl["edge"], RHAT)
                acc, acc_ls = accumulate(plv, ls, lvl["edge"], lvl["dest"],
                                         lvl["src"], lvl["src_plv"], trans,
                                         q_ext, dest_plv)
                plv, ls = write_levels(plv, ls, acc, acc_ls, (RHAT,),
                                       lvl["acc_nodes"])
                plv, ls = multiply_rescale(plv, ls, RRIGHT, RHAT, PHAT_LEFT,
                                           lvl["nodes"])
                plv, ls = multiply_rescale(plv, ls, RLEFT, RHAT, PHAT_RIGHT,
                                           lvl["nodes"])
                return (plv, ls), None

            (plv, ls), _ = jax.lax.scan(leaf_body, (plv, ls), lw)
            return plv, ls

        like_parent = jnp.asarray(sch.like_parent)
        like_r_plv = jnp.asarray(sch.like_r_plv)
        like_child = jnp.asarray(sch.like_child)
        like_mask = jnp.asarray(sch.like_mask)

        def likelihoods(plv, ls, bl, q, weights):
            """Per-edge log likelihoods + per-site log marginal + total
            marginal (reference GPDAG::ComputeLikelihoods +
            IncrementMarginalLikelihood)."""
            trans = jc69_transition(bl)
            r = plv[like_r_plv, like_parent]      # [E, 4, S]
            lsr = ls[like_r_plv, like_parent]
            p = plv[P, like_child]
            lsp = ls[P, like_child]
            val = jnp.einsum("eas,eab,ebs->es", r, trans, p,
                             precision=Precision)
            rows = jnp.log(jnp.where(val > 0, val, 1e-300)) + lsr + lsp
            per_edge = rows @ weights
            # Rootsplit edges: no transition matrix; RHat = q*pi at the same
            # node; conditional rows subtract log q.
            r0 = plv[RHAT, rootsplit_nodes]
            p0 = plv[P, rootsplit_nodes]
            lsp0 = ls[P, rootsplit_nodes]
            val0 = jnp.einsum("eas,eas->es", r0, p0, precision=Precision)
            rows0 = jnp.log(jnp.where(val0 > 0, val0, 1e-300)) + lsp0
            log_marginal_site = jax.scipy.special.logsumexp(rows0, axis=0)
            per_edge_root = (
                rows0 @ weights
                - jnp.log(q[rootsplit_edges]) * jnp.sum(weights)
            )
            per_edge = jnp.where(like_mask, per_edge, 0.0)
            per_edge = per_edge.at[rootsplit_edges].set(per_edge_root)
            return per_edge, log_marginal_site, log_marginal_site @ weights

        # -- optimization sweep (tidy traversal levelized, scanned) -------
        # Per leafward level, static index groups: the optimizable edges of
        # each side (parent at this level, child anywhere below) and the
        # phat-rebuild entries of the level's internal nodes.
        sweep = dict(lw)  # reuse the leafward acc entries / nodes / acc_nodes
        opt_cols: Dict[str, List[np.ndarray]] = {
            k: [] for k in ("r_edge", "r_parent", "r_child",
                            "l_edge", "l_parent", "l_child",
                            "internal",
                            "reb_r_edge", "reb_r_dest", "reb_r_src",
                            "reb_l_edge", "reb_l_dest", "reb_l_src")
        }
        for lvl in sch.leafward:
            internal = np.asarray(
                [u for u in lvl.nodes.tolist() if u >= sch.taxon_count],
                dtype=np.int32,
            )
            opt_cols["internal"].append(internal)
            for side, tag in ((RIGHT, "r"), (LEFT, "l")):
                edges, parents, children = [], [], []
                for u in lvl.nodes.tolist():
                    for c, e in self.dag.leafward[u][side]:
                        edges.append(e)
                        parents.append(u)
                        children.append(c)
                opt_cols[f"{tag}_edge"].append(
                    np.asarray(edges, dtype=np.int32))
                opt_cols[f"{tag}_parent"].append(
                    np.asarray(parents, dtype=np.int32))
                opt_cols[f"{tag}_child"].append(
                    np.asarray(children, dtype=np.int32))
                # Rebuild entries: this side's phat of the internal nodes.
                re_e, re_d, re_s = [], [], []
                for u in internal.tolist():
                    for c, e in self.dag.leafward[u][side]:
                        re_e.append(e)
                        re_d.append(u)
                        re_s.append(c)
                opt_cols[f"reb_{tag}_edge"].append(
                    np.asarray(re_e, dtype=np.int32))
                opt_cols[f"reb_{tag}_dest"].append(
                    np.asarray(re_d, dtype=np.int32))
                opt_cols[f"reb_{tag}_src"].append(
                    np.asarray(re_s, dtype=np.int32))
        pad_of = {"edge": E, "parent": N, "child": N, "dest": N, "src": N,
                  "internal": N}
        for k, cols in opt_cols.items():
            sweep[k] = jnp.asarray(_pad_stack(cols, pad_of[k.split("_")[-1]]))

        method = self.optimization_method

        def optimize_side(plv, bl_ext, edges, parents, children, r_plv, w):
            """Batched per-edge 1-D optimization over one side's edges,
            dispatching on the engine's optimization method (reference
            DAGBranchHandler::OptimizeBranchLength,
            src/dag_branch_handler.cpp:123-285); padding rows optimize a
            flat objective and scatter into the dummy bl slot."""
            r = plv[r_plv, parents]               # [K, 4, S]
            p = plv[P, children]

            def ll_of_t(t):
                trans = jc69_transition(t)        # [K, 4, 4]
                val = jnp.einsum("kas,kab,kbs->ks", r, trans, p,
                                 precision=Precision)
                return jnp.log(jnp.where(val > 0, val, 1e-300)) @ w

            def ll_y(y):
                return ll_of_t(jnp.exp(y))

            def per_lane_grad(f, x):
                return jax.jvp(f, (x,), (jnp.ones_like(x),))[1]

            guess_x = bl_ext[edges]
            lo = jnp.full(edges.shape, MIN_LOG_BL, dtype)
            hi = jnp.full(edges.shape, MAX_LOG_BL, dtype)

            if method in ("brent", "brent_with_gradients"):
                y0 = jnp.log(guess_x)

                def neg_ll(y):
                    return -ll_y(y)

                y_opt = optimize.brent_minimize_batched(
                    neg_ll, y0, lo, hi, iterations=60,
                    use_gradients=(method == "brent_with_gradients"))
                # Reset-if-worse guard (dag_branch_handler.cpp:143-150).
                worse = neg_ll(y_opt) > neg_ll(y0)
                x_new = jnp.where(worse, guess_x, jnp.exp(y_opt))
            elif method == "gradient_ascent":
                # The reference floors x at min_log_branch_length_ itself
                # (dag_branch_handler.cpp:225-228) — replicated as-is.
                def ffp(x):
                    return ll_of_t(x), per_lane_grad(ll_of_t, x)

                x_new = optimize.gradient_ascent_batched(
                    ffp, guess_x, jnp.full_like(guess_x, MIN_LOG_BL))
            elif method == "log_space_gradient_ascent":
                def ffp(x):
                    return ll_of_t(x), per_lane_grad(ll_of_t, x)

                x_new = optimize.log_space_gradient_ascent_batched(
                    ffp, guess_x,
                    jnp.full_like(guess_x, float(np.exp(MIN_LOG_BL))))
            elif method == "newton":
                def f3(y):
                    f = ll_y(y)
                    g = per_lane_grad(ll_y, y)
                    h = per_lane_grad(lambda z: per_lane_grad(ll_y, z), y)
                    return f, g, h

                y_opt = optimize.newton_raphson_batched(
                    f3, jnp.log(guess_x), lo, hi)
                x_new = jnp.exp(y_opt)
            else:
                raise ValueError(
                    f"Unknown optimization method: {method!r}")
            return bl_ext.at[edges].set(x_new)

        def rebuild_phat(plv, ls, bl_ext, q_ext, edge, dest, src, ptype,
                         nodes):
            """Recompute one phat side for `nodes` from current bl."""
            trans = jc69_transition(bl_ext)
            acc, acc_ls = accumulate(plv, ls, edge, dest, src,
                                     jnp.full_like(edge, P), trans, q_ext,
                                     jnp.full_like(edge, ptype))
            return write_levels(plv, ls, acc, acc_ls, (ptype,), nodes)

        def optimization_sweep(plv, ls, bl, q, weights):
            bl_ext, q_ext = ext(bl, q)
            plv, ls = seed_rhat(plv, ls, q)

            def body(carry, lvl):
                plv, ls, bl_ext = carry
                trans = jc69_transition(bl_ext)
                dest_plv = jnp.full_like(lvl["edge"], RHAT)
                acc, acc_ls = accumulate(plv, ls, lvl["edge"], lvl["dest"],
                                         lvl["src"], lvl["src_plv"], trans,
                                         q_ext, dest_plv)
                plv, ls = write_levels(plv, ls, acc, acc_ls, (RHAT,),
                                       lvl["acc_nodes"])
                # Right side: RRight = RHat o PHatLeft, optimize, rebuild.
                plv, ls = multiply_rescale(plv, ls, RRIGHT, RHAT, PHAT_LEFT,
                                           lvl["nodes"])
                bl_ext = optimize_side(plv, bl_ext, lvl["r_edge"],
                                       lvl["r_parent"], lvl["r_child"],
                                       RRIGHT, weights)
                plv, ls = rebuild_phat(plv, ls, bl_ext, q_ext,
                                       lvl["reb_r_edge"], lvl["reb_r_dest"],
                                       lvl["reb_r_src"], PHAT_RIGHT,
                                       lvl["internal"])
                # Left side.
                plv, ls = multiply_rescale(plv, ls, RLEFT, RHAT, PHAT_RIGHT,
                                           lvl["nodes"])
                bl_ext = optimize_side(plv, bl_ext, lvl["l_edge"],
                                       lvl["l_parent"], lvl["l_child"],
                                       RLEFT, weights)
                plv, ls = rebuild_phat(plv, ls, bl_ext, q_ext,
                                       lvl["reb_l_edge"], lvl["reb_l_dest"],
                                       lvl["reb_l_src"], PHAT_LEFT,
                                       lvl["internal"])
                plv, ls = multiply_rescale(plv, ls, P, PHAT_LEFT, PHAT_RIGHT,
                                           lvl["internal"])
                return (plv, ls, bl_ext), None

            (plv, ls, bl_ext), _ = jax.lax.scan(body, (plv, ls, bl_ext),
                                                sweep)
            return plv, ls, bl_ext[:E]

        self._populate = jax.jit(populate)
        self._likelihoods = jax.jit(likelihoods)
        self._optimization_sweep = jax.jit(optimization_sweep)

    # ------------------------------------------------------------------
    # public API (mirroring reference GPEngine / GPInstance verbs)
    # ------------------------------------------------------------------
    def shard_patterns(self, mesh, axis: str = "sites"):
        """Shard the site-pattern axis of the engine across a device mesh
        (SURVEY P5/P6: site patterns are the single distributed axis; DAG
        structure, q, and branch lengths stay replicated).  Patterns are
        padded to the mesh size with weight-zero all-ones columns, the
        tip/weight tensors are re-placed with NamedShardings, and the
        wavefront programs are rebuilt so XLA propagates the sharding
        through every PLV and inserts psums for the per-edge reductions."""
        from jax.sharding import PartitionSpec

        from ..dist import multihost

        n_dev = mesh.shape[axis]
        pad = (-self.S) % n_dev
        tips = np.asarray(self.tips)
        weights = np.asarray(self.weights)
        if pad:
            tips = np.concatenate(
                [tips, np.ones(tips.shape[:2] + (pad,), tips.dtype)],
                axis=-1,
            )
            weights = np.concatenate(
                [weights, np.zeros(pad, weights.dtype)])
            self.S = tips.shape[-1]
        # multihost.place works for single- and multi-process meshes alike.
        self.tips = multihost.place(
            jnp.asarray(tips, dtype=self.dtype), mesh,
            PartitionSpec(None, None, axis))
        self.weights = multihost.place(
            jnp.asarray(weights, dtype=self.dtype), mesh,
            PartitionSpec(axis))
        # Stale per-pattern state; programs close over tips/weights/S.
        self.plv = None
        self.ls = None
        self.per_edge_ll = None
        self.log_marginal_site = None
        self._build_programs()

    def populate_plvs(self):
        self.plv, self.ls = self._populate(self.branch_lengths, self.q,
                                           self.tips)

    def compute_likelihoods(self):
        assert self.plv is not None, "Call populate_plvs first"
        (self.per_edge_ll, self.log_marginal_site,
         self._log_marginal) = self._likelihoods(
            self.plv, self.ls, self.branch_lengths, self.q, self.weights
        )

    def log_marginal_likelihood(self) -> float:
        """Reference GPEngine::GetLogMarginalLikelihood: per-site log
        marginal dotted with site weights."""
        return float(self._log_marginal)

    def per_gpcsp_log_likelihoods(self) -> np.ndarray:
        return np.asarray(self.per_edge_ll)

    def per_gpcsp_components_of_full_log_marginal(self) -> np.ndarray:
        """Reference GetPerGPCSPComponentsOfFullLogMarginal."""
        return (
            np.asarray(self.per_edge_ll)
            + float(self.site_pattern.weights.sum()) * np.log(np.asarray(self.q))
        )

    def set_optimization_method(self, method: str):
        """Reference GPEngine::SetOptimizationMethod
        (src/gp_engine.cpp:656-658).  Switching methods changes the traced
        compute path, so the wavefront programs are rebuilt (one recompile
        per distinct method)."""
        valid = ("brent", "brent_with_gradients", "gradient_ascent",
                 "log_space_gradient_ascent", "newton")
        if method not in valid:
            raise ValueError(f"Unknown optimization method {method!r}; "
                             f"expected one of {valid}")
        if method != self.optimization_method:
            self.optimization_method = method
            self._build_programs()

    def use_gradient_optimization(self, use_gradients: bool = True):
        """Reference GPEngine::UseGradientOptimization
        (src/gp_engine.cpp:660-664): selects Brent-with-gradient-fallback
        vs plain Brent."""
        self.set_optimization_method(
            "brent_with_gradients" if use_gradients else "brent")

    def optimize_branch_lengths_once(self):
        old = self.branch_lengths
        self.plv, self.ls, self.branch_lengths = self._optimization_sweep(
            self.plv, self.ls, self.branch_lengths, self.q, self.weights
        )
        self.branch_length_differences = jnp.abs(self.branch_lengths - old)

    def estimate_branch_lengths(self, tol: float, max_iter: int,
                                quiet: bool = True) -> float:
        """Reference GPInstance::EstimateBranchLengths
        (src/gp_instance.cpp:241-310): coordinate-ascent sweeps until the
        mean |Delta bl| drops below tol."""
        self.populate_plvs()
        self.compute_likelihoods()
        current = self.log_marginal_likelihood()
        for it in range(max_iter):
            self.optimize_branch_lengths_once()
            self.populate_plvs()
            self.compute_likelihoods()
            marginal = self.log_marginal_likelihood()
            diff = float(jnp.mean(self.branch_length_differences))
            if not quiet:
                print(f"Iteration {it + 1}: marginal {marginal:.9f} "
                      f"mean|dbl| {diff:.3e}")
            if diff < tol:
                break
            current = marginal
        return current

    def _sbn_segment_arrays(self):
        """Flat segment-id arrays for the device-side SBN update, cached per
        schedule: seg_ids[e] in [0, nseg) for covered edges (-> bucket nseg
        for uncovered), plus singleton and covered masks."""
        segs = self.schedule.sbn_segments
        key = id(self.schedule)
        cached = getattr(self, "_sbn_seg_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1:]
        E = int(np.asarray(self.q).shape[0])
        seg_ids = np.full(E, len(segs), dtype=np.int32)
        singleton = np.zeros(E, dtype=bool)
        for i, (start, end) in enumerate(segs):
            seg_ids[start:end] = i
            if end - start == 1:
                singleton[start] = True
        covered = seg_ids < len(segs)
        out = (jnp.asarray(seg_ids), len(segs), jnp.asarray(singleton),
               jnp.asarray(covered))
        self._sbn_seg_cache = (key,) + out
        return out

    def update_sbn_probabilities(self):
        """Reference UpdateSBNProbabilities (src/gp_engine.cpp:304-321):
        per-parent-segment posterior normalization of q, computed as one
        XLA segment-softmax (segment_max / segment_sum) instead of a host
        loop over segments.  Segments whose hybrid marginals are all finite
        use those; otherwise the per-edge likelihoods."""
        seg_ids, nseg, singleton, covered = self._sbn_segment_arrays()
        q = jnp.asarray(self.q, dtype=self.dtype)
        ll = jnp.asarray(self.per_edge_ll, dtype=self.dtype)
        hybrid = jnp.asarray(self.hybrid_marginal_log_likelihoods,
                             dtype=self.dtype)
        self.q = _sbn_segment_softmax(q, ll, hybrid, seg_ids, nseg,
                                      singleton, covered)

    def estimate_sbn_parameters(self):
        """Reference GPInstance::EstimateSBNParameters: populate, compute
        likelihoods, then normalize q per segment."""
        self.populate_plvs()
        self.compute_likelihoods()
        self.update_sbn_probabilities()
        self.compute_likelihoods()

    # -- branch length initialization from trees -----------------------
    def _edge_lengths_from_trees(self, tree_collection) -> Dict[int, List[float]]:
        indexer = self.dag.build_edge_indexer()
        observed: Dict[int, List[float]] = {}
        from ..core.bitset import Subsplit
        from ..sbn.maps import rooted_rootsplit

        for tree in tree_collection.trees:
            topo = tree.topology
            n = topo.num_taxa
            cl = topo.clades()
            ch = topo.children()
            ss = {}
            for v in range(n):
                ss[v] = Subsplit.leaf(v, n)
            for v in range(n, topo.num_nodes):
                kids = ch[v]
                ss[v] = Subsplit.of_pair(cl[kids[0]], cl[kids[1]], n)
            for v in range(topo.num_nodes - 1):
                parent = int(topo.parents[v])
                from ..core.bitset import PCSP

                pcsp = PCSP.of_parent_child(ss[parent], ss[v]).to_string()
                if pcsp in indexer:
                    observed.setdefault(indexer[pcsp], []).append(
                        float(tree.branch_lengths[v])
                    )
        return observed

    def hot_start_branch_lengths(self, tree_collection):
        """Reference GPEngine::HotStartBranchLengths
        (src/gp_engine.cpp:676-746): per-edge mean of observed lengths."""
        bl = np.asarray(self.branch_lengths).copy()
        for e, vals in self._edge_lengths_from_trees(tree_collection).items():
            bl[e] = float(np.mean(vals))
        self.branch_lengths = jnp.asarray(bl, dtype=self.dtype)

    def take_first_branch_length(self, tree_collection):
        bl = np.asarray(self.branch_lengths).copy()
        for e, vals in self._edge_lengths_from_trees(tree_collection).items():
            bl[e] = vals[0]
        self.branch_lengths = jnp.asarray(bl, dtype=self.dtype)


from functools import partial


@partial(jax.jit, static_argnames=("nseg",))
def _sbn_segment_softmax(q, ll, hybrid, seg_ids, nseg, singleton, covered):
    """One-shot segment softmax for UpdateSBNProbabilities: per segment,
    normalize exp(src + log q); singletons pin to 1; uncovered edges keep
    their q."""
    finite = jnp.isfinite(hybrid)
    # A segment uses hybrid values iff every member is finite.
    seg_all_finite = jax.ops.segment_min(
        finite.astype(jnp.int32), seg_ids, num_segments=nseg + 1)
    use_hybrid = seg_all_finite[seg_ids] > 0
    src = jnp.where(use_hybrid, hybrid, ll)
    x = src + jnp.log(q)
    m = jax.ops.segment_max(x, seg_ids, num_segments=nseg + 1)
    p = jnp.exp(x - m[seg_ids])
    s = jax.ops.segment_sum(p, seg_ids, num_segments=nseg + 1)
    out = p / s[seg_ids]
    out = jnp.where(singleton, 1.0, out)
    return jnp.where(covered, out, q)


# ---------------------------------------------------------------------------
# Quartet hybrid marginals (reference GPEngine::CalculateQuartetHybridLikelihoods,
# src/gp_engine.cpp:748-816; requests per GPDAG::QuartetHybridRequestOf,
# src/gp_dag.cpp:413-458).
# ---------------------------------------------------------------------------
def _np_jc69(t: float) -> np.ndarray:
    e = np.exp(-4.0 * t / 3.0)
    return 0.25 * (1.0 - e) + e * np.eye(4)


@jax.jit
def _quartet_hybrid_program(root_pv, root_ls, root_bl, log_prior_g,
                            inv_prior_i, sis_pv, sis_ls, sis_bl, q_j,
                            central_bl, rot_pv, rot_ls, rot_bl, q_k,
                            sor_pv, sor_ls, sor_bl, q_l, weights):
    """All (i, j, k, l) quartet log likelihoods of one hybrid request in a
    single XLA program (replaces the reference's nested per-tip loops,
    src/gp_engine.cpp:748-816).  PV inputs are [N,4,S]; scale inputs [N,S];
    returns [I,J,K,L] in the reference's loop order."""
    root = jnp.einsum("iab,ibs->ias", jc69_transition(root_bl), root_pv)
    sis = jnp.einsum("jab,jbs->jas", jc69_transition(sis_bl), sis_pv)
    rot = jnp.einsum("kab,kbs->kas", jc69_transition(rot_bl), rot_pv)
    sor = jnp.einsum("lab,lbs->las", jc69_transition(sor_bl), sor_pv)
    r_s = root[:, None] * sis[None]                       # [I,J,4,S]
    q_s = jnp.einsum("ab,ijbs->ijas", jc69_transition(central_bl), r_s)
    r_sorted = q_s[:, :, None] * rot[None, None]          # [I,J,K,4,S]
    val = jnp.einsum("ijkas,las->ijkls", r_sorted, sor)   # [I,J,K,L,S]
    scales_ijk = (root_ls[:, None, None, :] + sis_ls[None, :, None, :]
                  + rot_ls[None, None, :, :])          # [I,J,K,S]
    per_site = (jnp.log(jnp.where(val > 0, val, 1e-300))
                + scales_ijk[:, :, :, None, :]
                + sor_ls[None, None, None, :, :]
                - log_prior_g[:, None, None, None, None])
    total = jnp.einsum("ijkls,s->ijkl", per_site, weights)
    non_seq = (jnp.log(inv_prior_i)[:, None, None, None]
               + jnp.log(q_j)[None, :, None, None]
               + jnp.log(q_k)[None, None, :, None]
               + jnp.log(q_l)[None, None, None, :])
    return total + non_seq


class _HybridMixin:
    def _hybrid_request(self, parent_id: int, is_left: bool, child_id: int):
        """(rootward, sister, rotated, sorted) tip lists: each entry is
        (node_id, plv_type, edge_id)."""
        from ..dag.schedule import P as P_PLV, RLEFT, RRIGHT
        from ..dag.subsplit_dag import LEFT, RIGHT

        dag = self.dag
        rootward = []
        for side in (RIGHT, LEFT):
            for g, e in dag.rootward[parent_id][side]:
                if g == dag.root_id:
                    continue
                rootward.append((g, RLEFT if side == LEFT else RRIGHT, e))
        sister_side = RIGHT if is_left else LEFT
        sister = [(s, P_PLV, e) for s, e in dag.leafward[parent_id][sister_side]]
        rotated = [(c, P_PLV, e) for c, e in dag.leafward[child_id][LEFT]]
        sorted_ = [(c, P_PLV, e) for c, e in dag.leafward[child_id][RIGHT]]
        return rootward, sister, rotated, sorted_

    def calculate_quartet_hybrid_likelihoods(
        self, parent_id: int, is_left: bool, child_id: int
    ) -> Optional[np.ndarray]:
        """Per-combination quartet log likelihoods for the central edge
        (parent, child); None if the request is not fully formed."""
        from ..dag.subsplit_dag import LEFT

        dag = self.dag
        rootward, sister, rotated, sorted_ = self._hybrid_request(
            parent_id, is_left, child_id
        )
        if not (rootward and sister and rotated and sorted_):
            return None
        central_edge = dag.edge_to_id[(parent_id, child_id)]
        plv, ls, bl, q = self.plv, self.ls, self.branch_lengths, self.q
        inv_prior = jnp.asarray(self.inverted_sbn_prior, dtype=self.dtype)
        node_probs = jnp.asarray(self.unconditional_node_probabilities,
                                 dtype=self.dtype)

        def gather(entries):
            nodes = jnp.asarray([n for n, _, _ in entries])
            types = jnp.asarray([t for _, t, _ in entries])
            edges = jnp.asarray([e for _, _, e in entries])
            return (plv[types, nodes], ls[types, nodes], bl[edges], edges)

        root_pv, root_ls, root_bl, root_e = gather(rootward)
        sis_pv, sis_ls, sis_bl, sis_e = gather(sister)
        rot_pv, rot_ls, rot_bl, rot_e = gather(rotated)
        sor_pv, sor_ls, sor_bl, sor_e = gather(sorted_)
        g_ids = jnp.asarray([g for g, _, _ in rootward])
        vals = _quartet_hybrid_program(
            root_pv, root_ls, root_bl, jnp.log(node_probs[g_ids]),
            inv_prior[root_e], sis_pv, sis_ls, sis_bl, q[sis_e],
            bl[central_edge], rot_pv, rot_ls, rot_bl, q[rot_e],
            sor_pv, sor_ls, sor_bl, q[sor_e],
            jnp.asarray(self.weights, dtype=self.dtype),
        )
        return np.asarray(vals).reshape(-1)

    def process_quartet_hybrid_request(self, parent_id: int, is_left: bool,
                                       child_id: int):
        vals = self.calculate_quartet_hybrid_likelihoods(
            parent_id, is_left, child_id
        )
        if vals is None:
            return
        from scipy.special import logsumexp

        central = self.dag.edge_to_id[(parent_id, child_id)]
        self.hybrid_marginal_log_likelihoods[central] = float(logsumexp(vals))

    def calculate_hybrid_marginals(self):
        """Reference GPInstance::CalculateHybridMarginals
        (src/gp_instance.cpp:408-417)."""
        from ..dag.subsplit_dag import LEFT

        self.populate_plvs()
        dag = self.dag
        self.hybrid_marginal_log_likelihoods = np.full(
            dag.edge_count(), -np.inf
        )
        for parent, side, child, edge in dag.topological_edge_traversal():
            if parent == dag.root_id or child < dag.taxon_count:
                continue
            self.process_quartet_hybrid_request(parent, side == LEFT, child)


for _name in ("_hybrid_request", "calculate_quartet_hybrid_likelihoods",
              "process_quartet_hybrid_request", "calculate_hybrid_marginals"):
    setattr(GPEngine, _name, getattr(_HybridMixin, _name))
