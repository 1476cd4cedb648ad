"""Tree-batch likelihood engine (the Engine/FatBeagle replacement).

Reference: src/engine.cpp:27-119 dispatches per-tree work to a pool of
FatBeagles; here one jitted XLA program evaluates the whole batch, with
per-tree phylogenetic model parameter rows (the analog of
FatBeagleParallelize's per-tree SetParameters, src/fat_beagle.hpp:151-184).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.site_pattern import SitePattern
from ..core.tree import Tree, TreeCollection
from ..models.phylo_model import PhyloModel, PhyloModelSpecification
from . import pruning
from .encode import (
    LeveledEncoding,
    TreeBatchEncoding,
    encode_trees,
    encode_trees_leveled,
)


def _paired_full_jit(pdst, ptip, psrc, ppost_e, edge_mask,
                     tips_src, weights_src, eig, rates_p, props_p, clock,
                     bl, Q, static):
    """Operand prep + paired gradient kernel as ONE jitted program.

    Eager prep dispatched ~100 ms of host/tunnel overhead per
    ll_and_branch_gradients call in this environment (measured round 5:
    same-trees repeat call 99-123 ms while the same math inside a jitted
    sweep costs 0.5 ms + one sync) — non-jitted callers (the VBPI inner
    loop, NNI scorers) pay it every step.  Tapes ride as traced args, so
    one compilation serves every same-shape tree batch."""
    from . import pallas_paired, pallas_pruning

    (M, T, CA, n_pair_slots, num_slots, s_tile, group,
     pattern_pad, interpret) = static
    P_blk, dP_blk, tips_flat, pivec, propvec, w = (
        pallas_pruning.prepare_inputs_grad_q(
            None, tips_src, weights_src, eig, rates_p, props_p, clock,
            bl, pattern_pad, Q=Q))
    return pallas_paired.paired_ll_and_gradients(
        pdst, ptip, psrc, ppost_e, edge_mask,
        P_blk, dP_blk, tips_flat, pivec, propvec, w,
        M=M, T=T, CA=CA, n_pair_slots=n_pair_slots,
        num_slots=num_slots, s_tile=s_tile, group=group,
        interpret=interpret)


_paired_full_jit = jax.jit(_paired_full_jit, static_argnames=("static",))


class TreeLikelihoodEngine:
    """Batched likelihood/gradient evaluation for a fixed tree batch.

    The encoding is rebuilt when topologies change; branch lengths and model
    parameters are plain device arrays, so sweeps over them stay jitted.
    """

    def __init__(
        self,
        site_pattern: SitePattern,
        model: PhyloModel,
        dtype=None,
    ):
        self.site_pattern = site_pattern
        self.model = model
        self.dtype = dtype or jnp.zeros(0).dtype
        # Per-state dimension A: 4 for nucleotide models, 64 for the
        # padded codon models (MG94).  All buffer shapes flow from here;
        # the pruning tape and the paired Pallas kernel are A-generic.
        self.num_states = getattr(model, "num_states", 4)
        S0 = site_pattern.pattern_count
        self.pattern_pad = pruning.pad_patterns(S0)
        # Pre-pad tips to the lane-aligned pattern count (padded columns are
        # all-ones "gaps" with weight zero), so the pattern axis can be
        # sharded across a device mesh directly.
        tips = np.ones((site_pattern.num_taxa, self.pattern_pad,
                        self.num_states))
        tips[:, :S0, :] = site_pattern.tip_partials()
        self.tip_partials = jnp.asarray(tips, dtype=self.dtype)
        w = np.zeros(self.pattern_pad)
        w[:S0] = site_pattern.weights
        self.weights = jnp.asarray(w, dtype=self.dtype)
        self._encoding: Optional[TreeBatchEncoding] = None
        self._encoding_key = None
        self._leveled: Optional[LeveledEncoding] = None
        self._leveled_key = None
        # The scan tape is the default execution path: measured on TPU v5e
        # (DS1 batch 200) it runs ~3.6x faster than the levelized wavefront
        # variant, whose multi-row gather/scatter XLA lowering loses to the
        # scan's in-place single-row dynamic-update-slices.  The levelized
        # kernels remain available for cross-checks and future tuning.
        self.use_leveled = False
        # Kernel selection for the hot path (the reference's product hot
        # path IS its engine, src/fat_beagle.cpp:49-169, so the fastest
        # kernel must be what the API serves):
        #   "auto"   — VMEM-resident Pallas kernel on TPU in f32 with a
        #              shared (non-per-tree) model; scan tape otherwise.
        #   "scan"   — always the scan tape.
        #   "pallas" — force the Pallas kernel (f32 parity ~6e-6 rel,
        #              pinned <=5e-5 by the bench guard).
        # The pattern axis must be unsharded for the Pallas path;
        # shard_patterns() drops to the scan tape.
        self.kernel = "auto"
        self._pattern_sharding = None

    # -- kernel selection --------------------------------------------------
    def _use_pallas(self, shared_model: bool) -> bool:
        if self.kernel == "scan" or self.use_leveled:
            return False
        if self._pattern_sharding is not None and not (
                self._use_chunked() or self._use_paired()):
            # The chunked and paired kernels compose with pattern sharding
            # (they run per-shard under shard_map); other shapes use the
            # scan tape, whose sharding XLA propagates directly.
            return False
        if self.kernel in ("pallas", "pallas_interpret",
                           "chunked", "chunked_interpret"):
            # Explicit kernel choices force the Pallas dispatch branch;
            # the chunked opt-in was previously unreachable here (advisor
            # round-4 finding: kernel="chunked" silently ran the scan tape).
            return True
        return (
            self.kernel == "auto"
            and jax.default_backend() == "tpu"
            and self.dtype == jnp.float32
            and shared_model
            # Codon (A=64): the scan tape beats the paired kernel on v5e
            # (8.9k vs 7.0k evals/s at batch 128, round 5) — at CA=64 the
            # batched evolves are real MXU matmuls and XLA's pipelining
            # wins over the kernel's VMEM-capped operand re-streaming.
            # The 4-state latency-bound regime is the opposite (39k
            # paired vs 11k scan).  kernel="pallas" still forces it.
            and self.num_states == 4
        )

    def _shared_model(self, params: Dict[str, jnp.ndarray]) -> bool:
        """The Pallas kernel folds one model's pi/proportions for the whole
        batch; per-tree model parameter rows need the scan tape."""
        return all(jnp.asarray(params[k]).ndim == 1
                   for k in self.model.blocks)

    def _rate_Q(self, params: Dict[str, jnp.ndarray]):
        """Shared-model padded rate matrix for the uniformized transition
        route (codon models; None otherwise).  Per-tree parameter rows
        fall back to the eigen route."""
        if not self._shared_model(params):
            return None
        return self.model.rate_matrix(params)

    def _pallas_tips(self) -> jnp.ndarray:
        if not hasattr(self, "_pallas_tips_cache"):
            # ensure_compile_time_eval: the first call may happen inside a
            # caller's jit trace (e.g. a jitted sweep over branch_eval_fn);
            # without it the cache would capture a tracer and poison every
            # later trace (UnexpectedTracerError, round-5 codon bench).
            with jax.ensure_compile_time_eval():
                self._pallas_tips_cache = jnp.asarray(
                    self.site_pattern.tip_partials(), jnp.float32)
        return self._pallas_tips_cache

    def _use_paired(self) -> bool:
        """The paired-slot kernel (pallas_paired.py) is the product
        default: every category count reaches its CA%16==0 shape via
        zero-proportion category padding (_padded_categories)."""
        return self.kernel not in ("chunked", "chunked_interpret")

    def _padded_categories(self) -> int:
        """Category count after padding so CA = C*A is a multiple of 16
        (bf16 sublane tiles for the paired kernel; the chunked kernel
        needs only a multiple of 8).  Pad categories carry rate 1 and
        proportion 0, so every computed quantity is exactly unchanged;
        this is how constant-site models (CA=4, e.g. the JC69 BASELINE
        config) get the fast kernel instead of silently falling back to
        the scan tape.  For A=64 codon models any C already satisfies
        both alignments (64 % 16 == 0), so no padding happens."""
        import math

        C = self.model.category_count
        req = 8 if self._use_chunked() else 16
        m = req // math.gcd(self.num_states, req)
        return C if C % m == 0 else C + (-C) % m

    def _padded_CA(self) -> int:
        """Fused category-state dimension CA = padded_C * A fed to the
        Pallas kernels (their per-op operand blocks are [2*CA, 2*CA])."""
        return self._padded_categories() * self.num_states

    def _use_chunked(self) -> bool:
        """The chunked level-synchronous kernel (pallas_chunked.py) is an
        explicit opt-in (kernel="chunked"/"chunked_interpret"): measured
        on v5e it loses to the paired kernel (the wide f32 chunk bodies
        cost more VPU register passes than they save in serialization —
        see IMPLEMENTATION_NOTES round 4); it remains a tested,
        documented alternative."""
        use = self.kernel in ("chunked", "chunked_interpret")
        if use and self.num_states != 4:
            # The chunked prep is wired to the eigen transition route,
            # whose f32 small-entry cancellation makes codon gradients
            # wrong (round-5 finding) — refuse loudly rather than
            # silently computing bad numbers.
            raise ValueError(
                "kernel='chunked' supports 4-state models only; codon "
                "models run on the scan tape (auto) or kernel='pallas'")
        return use

    def _chunk_W(self) -> int:
        """Chunk width: 2*W*CA = 128 fills one MXU contraction tile; never
        below 4 so per-chunk gradient-row stores stay 8-aligned."""
        CA = self._padded_CA()
        return max(4, 128 // (2 * CA))

    def _pad_model_ingredients(self, eig, rates, props):
        """Append zero-proportion, rate-1 category columns up to the
        padded category count (exact no-op on all outputs)."""
        Cp = self._padded_categories()
        C = rates.shape[-1]
        if Cp == C:
            return rates, props
        B = rates.shape[0]
        pad = Cp - C
        rates = jnp.concatenate(
            [rates, jnp.ones((B, pad), rates.dtype)], axis=-1)
        props = jnp.concatenate(
            [props, jnp.zeros((B, pad), props.dtype)], axis=-1)
        return rates, props

    def _chunked_encoding(self, enc):
        """Chunked-schedule tapes for an encoding, cached on the encoding
        object (its lifetime matches the tapes' validity)."""
        W = self._chunk_W()
        cache = getattr(enc, "_chunked_cache", None)
        if cache is None or cache[0].W != W:
            from . import pallas_chunked

            ce = pallas_chunked.build_chunked_encoding(enc, W=W)
            cache = (
                ce,
                jnp.asarray(ce.post_dst), jnp.asarray(ce.tip_slot),
                jnp.asarray(ce.post_e), jnp.asarray(ce.node_row),
            )
            enc._chunked_cache = cache
        return cache

    def _paired_encoding(self, enc):
        """Paired-slot tapes for an encoding, cached on the encoding object
        (its lifetime matches the tapes' validity)."""
        cache = getattr(enc, "_paired_cache", None)
        if cache is None:
            from . import pallas_paired

            pe = pallas_paired.build_paired_encoding(enc)
            cache = (
                pe,
                jnp.asarray(pe.post_dst), jnp.asarray(pe.tip_slot),
                jnp.asarray(pe.post_src), jnp.asarray(pe.post_e),
            )
            enc._paired_cache = cache
        return cache

    def _paired_tiles(self, batch: int):
        """(group, s_tile) for the paired gradient kernel.  Measured on v5e
        (DS1, batch 200, round 4): with the Mosaic scoped-VMEM limit
        raised (BITO_PALLAS_VMEM_MB) G=4 at the whole-pad tile edges out
        G=2 (39.7k vs 37.6k evals/s); the budget below reproduces the
        tile<=1024 cap that tuning landed on for CA=16 and scales it for
        larger state spaces (codon CA=64 carries 4x the scratch per
        pattern column, so the same VMEM admits a 4x smaller
        tile x group product)."""
        group = 4 if batch % 4 == 0 else (2 if batch % 2 == 0 else 1)
        tile = self._pallas_s_tile()
        CA = self._padded_CA()
        if CA > 16:
            # Bandwidth-bound regime (codon CA=64): small tiles re-stream
            # the per-op operand stacks once per pattern tile, so G=1 at
            # the whole-pad tile measured fastest (6.2k vs 5.5k evals/s
            # under the latency-regime policy below; round-5 sweep).
            return 1, tile
        # CA=16 tuning point: G>1 x tile 1024; keep tile*CA*group within
        # that envelope (tile_budget per interleaved tree ~= 1024*16/CA).
        cap = max(128, 1024 * 16 // CA)
        while group > 1 and tile > cap:
            for t in (cap, cap // 2, 128):
                if t >= 128 and self.pattern_pad % t == 0:
                    return group, t
            group //= 2  # no aligned smaller tile: shrink the interleave
        return group, tile

    def _pallas_grad_call(self, enc, eig, rates, props, clock, bl,
                          Q=None):
        """Dispatch one LL+branch-gradient evaluation through the selected
        Pallas kernel (chunked level-synchronous by default, the paired or
        original kernel otherwise).  Traceable: safe to call from inside a
        jitted sweep."""
        from . import pallas_pruning

        interpret = self.kernel in ("pallas_interpret",
                                    "chunked_interpret")
        if self._use_chunked():
            from . import pallas_chunked

            rates_p, props_p = self._pad_model_ingredients(eig, rates, props)
            P_blk, dP_blk, tips_flat, pivec, propvec, w = (
                pallas_pruning.prepare_inputs_grad(
                    enc, self._pallas_tips(), self.site_pattern.weights,
                    eig, rates_p, props_p, clock, bl, self.pattern_pad))
            ce, cdst, ctip, cpost_e, cnode_row = self._chunked_encoding(enc)
            CA = self._padded_CA()
            edge_mask = jnp.asarray(enc.edge_mask, jnp.float32)
            if self._pattern_sharding is not None:
                mesh, ax = self._pattern_sharding
                return pallas_chunked.chunked_ll_and_gradients_sharded(
                    mesh, ax, cdst, ctip, cpost_e, cnode_row, edge_mask,
                    P_blk, dP_blk, tips_flat, pivec, propvec, w,
                    Mc=ce.Mc, W=ce.W, T=ce.num_taxa, CA=CA,
                    num_slots=enc.num_slots, interpret=interpret)
            return pallas_chunked.chunked_ll_and_gradients(
                cdst, ctip, cpost_e, cnode_row, edge_mask,
                P_blk, dP_blk, tips_flat, pivec, propvec, w,
                Mc=ce.Mc, W=ce.W, T=ce.num_taxa, CA=CA,
                num_slots=enc.num_slots, s_tile=self._pallas_s_tile(),
                interpret=interpret)
        if self._use_paired():
            from . import pallas_paired

            pe, pdst, ptip, psrc, ppost_e = self._paired_encoding(enc)
            rates_p, props_p = self._pad_model_ingredients(eig, rates,
                                                           props)
            group, s_tile = self._paired_tiles(enc.batch_size)
            if self._pattern_sharding is not None:
                P_blk, dP_blk, tips_flat, pivec, propvec, w = (
                    pallas_pruning.prepare_inputs_grad_q(
                        enc, self._pallas_tips(),
                        self.site_pattern.weights,
                        eig, rates_p, props_p, clock, bl,
                        self.pattern_pad, Q=Q))
                mesh, ax = self._pattern_sharding
                return pallas_paired.paired_ll_and_gradients_sharded(
                    mesh, ax, pdst, ptip, psrc, ppost_e,
                    jnp.asarray(enc.edge_mask, jnp.float32),
                    P_blk, dP_blk, tips_flat, pivec, propvec, w,
                    M=pe.M, T=pe.num_taxa,
                    CA=self._padded_CA(),
                    n_pair_slots=pe.n_pair_slots, num_slots=enc.num_slots,
                    group=group, interpret=interpret)
            # Prep + kernel in ONE jitted program (eager prep measured
            # ~100 ms of dispatch overhead per call for non-jitted
            # callers; see _paired_full_jit).
            static = (pe.M, pe.num_taxa, self._padded_CA(),
                      pe.n_pair_slots, enc.num_slots, s_tile, group,
                      self.pattern_pad, interpret)
            return _paired_full_jit(
                pdst, ptip, psrc, ppost_e,
                jnp.asarray(enc.edge_mask, jnp.float32),
                self._pallas_tips(),
                jnp.asarray(self.site_pattern.weights, jnp.float32),
                eig, rates_p, props_p, clock, bl, Q, static)
        kargs = pallas_pruning.prepare_inputs_grad(
            enc, self._pallas_tips(), self.site_pattern.weights,
            eig, rates, props, clock, bl, self.pattern_pad)
        return pallas_pruning.pallas_ll_and_gradients(
            jnp.asarray(enc.post_ops), jnp.asarray(enc.pre_ops),
            jnp.asarray(enc.root),
            jnp.asarray(enc.edge_mask, jnp.float32), *kargs,
            num_slots=enc.num_slots,
            category_count=self.model.category_count,
            s_tile=self._pallas_s_tile(), interpret=interpret)

    def _pallas_s_tile(self) -> int:
        # One whole-pad tile per tree wins on v5e when it fits VMEM
        # (bench: 31.8k vs 20.2k evals/s against s_tile=512).
        if self.pattern_pad <= 2048:
            return self.pattern_pad
        for tile in (2048, 1024, 512, 256, 128):
            if self.pattern_pad % tile == 0:
                return tile
        return self.pattern_pad

    def shard_patterns(self, mesh, axis: str = "sites"):
        """Shard the site-pattern axis across a device mesh (SURVEY P5/P6:
        patterns are the single distributed axis; tree encodings, branch
        lengths, and model parameters stay replicated).  The engine's tips
        are already padded to a lane multiple with weight-zero columns, so
        re-placing tips [T, S, A] and weights [S] with NamedShardings is
        enough: XLA propagates the sharding through the pruning scans and
        inserts psums for the per-tree reductions.  The Pallas kernel path
        requires an unsharded pattern axis and is disabled."""
        from jax.sharding import PartitionSpec

        from ..dist import multihost

        n_dev = mesh.shape[axis]
        if self.pattern_pad % n_dev:
            extra = (-self.pattern_pad) % n_dev
            tips = np.ones(
                (self.tip_partials.shape[0], self.pattern_pad + extra, 4))
            tips[:, : self.pattern_pad] = np.asarray(self.tip_partials)
            w = np.zeros(self.pattern_pad + extra)
            w[: self.pattern_pad] = np.asarray(self.weights)
            self.pattern_pad += extra
            self.tip_partials = jnp.asarray(tips, dtype=self.dtype)
            self.weights = jnp.asarray(w, dtype=self.dtype)
        # multihost.place works for single- and multi-process meshes alike.
        self.tip_partials = multihost.place(
            self.tip_partials, mesh, PartitionSpec(None, axis, None))
        self.weights = multihost.place(
            self.weights, mesh, PartitionSpec(axis))
        self._pattern_sharding = (mesh, axis)

    # -- encoding cache -------------------------------------------------
    def encode(self, trees: Sequence[Tree]) -> TreeBatchEncoding:
        key = tuple(t.topology.key() for t in trees)
        if key != self._encoding_key:
            self._encoding = encode_trees([t.topology for t in trees])
            self._encoding_key = key
        return self._encoding

    def encode_leveled(self, trees: Sequence[Tree]) -> LeveledEncoding:
        key = tuple(t.topology.key() for t in trees)
        if key != self._leveled_key:
            self._leveled = encode_trees_leveled(
                [t.topology for t in trees]
            )
            self._leveled_key = key
        return self._leveled

    def branch_length_matrix(self, trees: Sequence[Tree],
                             enc: TreeBatchEncoding) -> jnp.ndarray:
        bl = np.zeros((len(trees), enc.num_slots))
        for b, t in enumerate(trees):
            bl[b, : t.topology.num_nodes] = t.branch_lengths
        return jnp.asarray(bl, dtype=self.dtype)

    def _model_ingredients(self, params: Dict[str, jnp.ndarray], batch: int):
        """Per-tree model ingredients (eig fields [B,...], rates/props [B,C],
        clock [B]).  `params` values may be shared (unbatched) or carry a
        leading per-tree axis (the reference's phylo_model_params_ matrix,
        src/generic_sbn_instance.hpp:32-40)."""

        def one(p):
            eig = self.model.eigen(p)
            eig = type(eig)(*(jnp.asarray(x, dtype=self.dtype) for x in eig))
            rates = self.model.category_rates(p).astype(self.dtype)
            props = self.model.category_proportions(p).astype(self.dtype)
            clock = jnp.asarray(self.model.clock_rate(p), dtype=self.dtype)
            return eig, rates, props, clock

        vals = {k: jnp.asarray(params[k]) for k in self.model.blocks}
        if all(v.ndim == 1 for v in vals.values()):
            # Shared model: one eigendecomposition, broadcast — not B
            # identical vmapped ones.  With concrete params (the normal
            # engine call path; closure constants stay concrete even
            # inside an outer jit trace) this also lets models with
            # host-side eigen paths (MG94's float64 61-state eigh,
            # models/codon.py mg94_eigen) take them.
            eig, rates, props, clock = one(vals)
            bcast = lambda x: jnp.broadcast_to(x, (batch,) + x.shape)
            return (type(eig)(*(bcast(x) for x in eig)), bcast(rates),
                    bcast(props), bcast(clock))
        batched = {
            k: (jnp.broadcast_to(v, (batch, self.model.blocks[k][1]))
                if v.ndim == 1 else v)
            for k, v in vals.items()
        }
        return jax.vmap(one)(batched)

    # -- public API ------------------------------------------------------
    @staticmethod
    def _bucket_trees(trees: Sequence[Tree]):
        """Pad a tree batch to the next multiple of 32 (powers of two below)
        by repeating the last tree.  Callers with iteration-varying batch
        sizes (the NNI loop scores a different candidate count every epoch)
        opt in so the jitted programs compile once per bucket instead of
        once per iteration.  Returns (padded_trees, true_count)."""
        b = len(trees)
        target = 4
        while target < b:
            target = target * 2 if target < 32 else target + 32
        return list(trees) + [trees[-1]] * (target - b), b

    def _pad_batch(self, trees, branch_lengths):
        """Pad an odd tree batch to even by repeating the last tree, so the
        Pallas kernels keep their G-way interleave (an odd batch would
        silently drop to G=1, the round-3 latency-hiding loss).  Returns
        (trees, branch_lengths, true_count)."""
        b = len(trees)
        if b % 2 == 0 or not self._use_pallas(True):
            return trees, branch_lengths, b
        trees = list(trees) + [trees[-1]]
        if branch_lengths is not None:
            branch_lengths = jnp.concatenate(
                [branch_lengths, branch_lengths[-1:]], axis=0)
        return trees, branch_lengths, b

    def log_likelihoods(
        self, trees: Sequence[Tree], params: Dict[str, jnp.ndarray],
        branch_lengths: Optional[jnp.ndarray] = None,
        bucket: bool = False,
    ) -> jnp.ndarray:
        if bucket and branch_lengths is None:
            padded, b = self._bucket_trees(trees)
            return self.log_likelihoods(padded, params)[:b]
        trees, branch_lengths, true_b = self._pad_batch(trees,
                                                        branch_lengths)
        if len(trees) != true_b:
            return self.log_likelihoods(trees, params,
                                        branch_lengths)[:true_b]
        enc = self.encode(trees)
        bl = (branch_lengths if branch_lengths is not None
              else self.branch_length_matrix(trees, enc))
        eig, rates, props, clock = self._model_ingredients(params, len(trees))
        if self._use_pallas(self._shared_model(params)):
            from . import pallas_pruning

            if self._use_chunked():
                from . import pallas_chunked

                rates_p, props_p = self._pad_model_ingredients(
                    eig, rates, props)
                P_blk, tips_flat, piprop, w = pallas_pruning.prepare_inputs(
                    enc, self._pallas_tips(), self.site_pattern.weights,
                    eig, rates_p, props_p, clock, bl, self.pattern_pad)
                ce, cdst, ctip, cpost_e, _cnode_row = (
                    self._chunked_encoding(enc))
                CA = self._padded_CA()
                interpret = self.kernel in ("pallas_interpret",
                                            "chunked_interpret")
                if self._pattern_sharding is not None:
                    mesh, ax = self._pattern_sharding
                    ll = pallas_chunked.chunked_log_likelihoods_sharded(
                        mesh, ax, cdst, ctip, P_blk, cpost_e, tips_flat,
                        piprop, w, Mc=ce.Mc, W=ce.W, T=ce.num_taxa,
                        CA=CA, interpret=interpret)
                    return ll.astype(self.dtype)
                ll = pallas_chunked.chunked_log_likelihoods(
                    cdst, ctip, P_blk, cpost_e, tips_flat, piprop, w,
                    Mc=ce.Mc, W=ce.W, T=ce.num_taxa, CA=CA,
                    s_tile=self._pallas_s_tile(), interpret=interpret)
                return ll.astype(self.dtype)
            if self._use_paired():
                from . import pallas_paired

                pe, pdst, ptip, _psrc, ppost_e = self._paired_encoding(enc)
                rates_p, props_p = self._pad_model_ingredients(
                    eig, rates, props)
                P_blk, tips_flat, piprop, w = pallas_pruning.prepare_inputs(
                    enc, self._pallas_tips(), self.site_pattern.weights,
                    eig, rates_p, props_p, clock, bl, self.pattern_pad,
                    Q=self._rate_Q(params))
                # Shared (group, tile) policy with the gradient path: the
                # LL kernel's scratch per interleaved tree is the same
                # hi/lo planes + scales, so it honors the same VMEM cap
                # (advisor round-3 finding: the LL path used the uncapped
                # tile).
                group, ll_tile = self._paired_tiles(len(trees))
                interpret = self.kernel == "pallas_interpret"
                if self._pattern_sharding is not None:
                    mesh, ax = self._pattern_sharding
                    ll = pallas_paired.paired_log_likelihoods_sharded(
                        mesh, ax, pdst, ptip, P_blk, ppost_e, tips_flat,
                        piprop, w, M=pe.M, T=pe.num_taxa,
                        CA=self._padded_CA(),
                        n_pair_slots=pe.n_pair_slots, group=group,
                        interpret=interpret)
                    return ll.astype(self.dtype)
                ll = pallas_paired.paired_log_likelihoods(
                    pdst, ptip, P_blk, ppost_e, tips_flat, piprop, w,
                    M=pe.M, T=pe.num_taxa,
                    CA=self._padded_CA(),
                    n_pair_slots=pe.n_pair_slots,
                    s_tile=ll_tile,
                    group=group, interpret=interpret)
                return ll.astype(self.dtype)
            kargs = pallas_pruning.prepare_inputs(
                enc, self._pallas_tips(), self.site_pattern.weights,
                eig, rates, props, clock, bl, self.pattern_pad)
            ll = pallas_pruning.pallas_log_likelihoods(
                jnp.asarray(enc.post_ops), jnp.asarray(enc.root), *kargs,
                num_slots=enc.num_slots,
                category_count=self.model.category_count,
                s_tile=self._pallas_s_tile(),
                interpret=(self.kernel == "pallas_interpret"))
            return ll.astype(self.dtype)
        if self.use_leveled:
            lev = self.encode_leveled(trees)
            return pruning.log_likelihoods_leveled_impl(
                jnp.asarray(lev.post_levels), jnp.asarray(lev.root),
                self.tip_partials, self.weights, bl,
                eig, rates, props, clock,
                num_slots=lev.num_slots, pattern_pad=self.pattern_pad,
                category_count=self.model.category_count,
            )
        return pruning.log_likelihoods_impl(
            jnp.asarray(enc.post_ops), jnp.asarray(enc.root),
            self.tip_partials, self.weights, bl,
            eig, rates, props, clock, self._rate_Q(params),
            num_slots=enc.num_slots, pattern_pad=self.pattern_pad,
            category_count=self.model.category_count,
        )

    def ll_and_branch_gradients(
        self, trees: Sequence[Tree], params: Dict[str, jnp.ndarray],
        branch_lengths: Optional[jnp.ndarray] = None,
    ):
        trees, branch_lengths, true_b = self._pad_batch(trees,
                                                        branch_lengths)
        if len(trees) != true_b:
            ll, grads = self.ll_and_branch_gradients(trees, params,
                                                     branch_lengths)
            return ll[:true_b], grads[:true_b]
        enc = self.encode(trees)
        bl = (branch_lengths if branch_lengths is not None
              else self.branch_length_matrix(trees, enc))
        eig, rates, props, clock = self._model_ingredients(params, len(trees))
        if self._use_pallas(self._shared_model(params)):
            ll, grads = self._pallas_grad_call(enc, eig, rates, props,
                                               clock, bl,
                                               Q=self._rate_Q(params))
            return ll.astype(self.dtype), grads.astype(self.dtype)
        if self.use_leveled:
            lev = self.encode_leveled(trees)
            return pruning.ll_and_branch_gradients_leveled_impl(
                jnp.asarray(lev.post_levels), jnp.asarray(lev.pre_levels),
                jnp.asarray(lev.root),
                jnp.asarray(lev.edge_mask, dtype=self.dtype),
                self.tip_partials, self.weights, bl,
                eig, rates, props, clock,
                num_slots=lev.num_slots, pattern_pad=self.pattern_pad,
                category_count=self.model.category_count,
            )
        return pruning.ll_and_branch_gradients_impl(
            jnp.asarray(enc.post_ops), jnp.asarray(enc.pre_ops),
            jnp.asarray(enc.root), jnp.asarray(enc.edge_mask, dtype=self.dtype),
            self.tip_partials, self.weights, bl,
            eig, rates, props, clock, self._rate_Q(params),
            num_slots=enc.num_slots, pattern_pad=self.pattern_pad,
            category_count=self.model.category_count,
        )

    def branch_eval_fn(self, trees: Sequence[Tree],
                       params: Dict[str, jnp.ndarray]):
        """Return a traceable closure bl[B, N] -> (ll[B], grads[B, N]) bound
        to this tree batch, model parameters, and the engine's current
        kernel path — for embedding many evaluations in one jitted sweep
        (a VBPI inner loop or branch-length scan) without per-call host
        work.  This is the engine's hot path; bench.py drives it."""
        true_b = len(trees)
        trees, _, _ = self._pad_batch(trees, None)
        pad = len(trees) != true_b
        enc = self.encode(trees)
        eig, rates, props, clock = self._model_ingredients(params, len(trees))
        if self._use_pallas(self._shared_model(params)):
            if self._use_chunked():
                self._chunked_encoding(enc)  # build the tapes outside jit
            elif self._use_paired():
                self._paired_encoding(enc)

            Q = self._rate_Q(params)

            def fn(bl):
                if pad:
                    bl = jnp.concatenate([bl, bl[-1:]], axis=0)
                ll, grads = self._pallas_grad_call(enc, eig, rates, props,
                                                   clock, bl, Q=Q)
                return (ll[:true_b].astype(self.dtype),
                        grads[:true_b].astype(self.dtype))

            return fn

        post_ops = jnp.asarray(enc.post_ops)
        pre_ops = jnp.asarray(enc.pre_ops)
        root = jnp.asarray(enc.root)
        edge_mask = jnp.asarray(enc.edge_mask, dtype=self.dtype)

        Q = self._rate_Q(params)

        def fn(bl):
            return pruning.ll_and_branch_gradients_impl(
                post_ops, pre_ops, root, edge_mask,
                self.tip_partials, self.weights, bl,
                eig, rates, props, clock, Q,
                num_slots=enc.num_slots, pattern_pad=self.pattern_pad,
                category_count=self.model.category_count,
            )

        return fn

    def ll_eval_fn(self, trees: Sequence[Tree],
                   params: Dict[str, jnp.ndarray]):
        """LL-only analog of branch_eval_fn: a traceable closure
        bl[B, N] -> ll[B] bound to this tree batch and the engine's current
        kernel dispatch (paired Pallas kernel by default on TPU) — so
        LL-only sweeps measure and serve the same path log_likelihoods
        dispatches, not a hand-assembled kernel call."""
        true_b = len(trees)
        trees, _, _ = self._pad_batch(trees, None)
        pad = len(trees) != true_b
        enc = self.encode(trees)
        if self._use_pallas(self._shared_model(params)):
            if self._use_chunked():
                self._chunked_encoding(enc)  # build the tapes outside jit
            elif self._use_paired():
                self._paired_encoding(enc)

        def fn(bl):
            if pad:
                bl = jnp.concatenate([bl, bl[-1:]], axis=0)
            return self.log_likelihoods(trees, params,
                                        branch_lengths=bl)[:true_b]

        return fn

    def optimize_selected_branches(
        self, trees: Sequence[Tree], params: Dict[str, jnp.ndarray],
        selected_nodes: Sequence[Sequence[int]], iterations: int = 2,
        max_selected: int = 8, bucket: bool = False,
    ) -> np.ndarray:
        """Exact conditional Brent optimization of selected branches per
        tree (batched); returns the branch-length matrix [B, N].  The
        classical-engine counterpart of the reference TPEngine's
        proposed-NNI new-edge optimization (src/tp_engine.cpp:1423-1427)."""
        if bucket:
            # Pad the batch to a bucket and pin K at max_selected so the
            # jitted program compiles once per bucket, not per NNI epoch.
            padded, b = self._bucket_trees(list(trees))
            sel = list(selected_nodes) + [[]] * (len(padded) - b)
            K = max_selected
            trees, selected_nodes = padded, sel
        else:
            b = len(trees)
            K = min(max_selected,
                    max((len(s) for s in selected_nodes), default=1)) or 1
        enc = self.encode(trees)
        bl = self.branch_length_matrix(trees, enc)
        eig, rates, props, clock = self._model_ingredients(params, len(trees))
        sel = np.full((len(trees), K), enc.num_slots, dtype=np.int32)
        mask = np.zeros((len(trees), K), dtype=bool)
        for i, nodes in enumerate(selected_nodes):
            nodes = list(nodes)[:K]
            sel[i, : len(nodes)] = nodes
            mask[i, : len(nodes)] = True
        out = pruning.optimize_selected_branches_impl(
            jnp.asarray(enc.post_ops), jnp.asarray(enc.pre_ops),
            jnp.asarray(enc.root), self.tip_partials, self.weights, bl,
            eig, rates, props, clock,
            jnp.asarray(sel), jnp.asarray(mask),
            num_slots=enc.num_slots, pattern_pad=self.pattern_pad,
            category_count=self.model.category_count,
            iterations=iterations,
        )
        return np.asarray(out)[:b]
