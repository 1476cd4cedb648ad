"""Measured benchmarks for ALL five BASELINE.json configs.

bench.py's stdout JSON line stays the single flagship metric (config 2,
DS1 GTR+Gamma4 LL+gradient).  This module measures the other four configs
and writes them next to it as BENCH_CONFIGS.json, giving the driver
round-over-round visibility into the GP, VI, and NNI paths (the reference
ships per-stage benchmark machinery for exactly these,
/root/reference/extras/benchmark.cpp:118-127,
/root/reference/src/gp_instance.cpp:303-309).

Configs (BASELINE.json "configs"):
  1. hello JC69 single-tree log likelihood (parity + throughput)
  2. [bench.py] DS1 GTR+Gamma4 LL+gradient evals/sec/chip
  3. GP engine on DS1.subsampled_10: PLV populate + per-PCSP likelihoods
     per dispatch, and one branch-optimization sweep
  4. VBPI 20-particle gradient step (vip/burrito mirror) on DS1
  5. End-to-end NNI search iterations/sec: GP-scored six_taxon and the
     faithful TP-likelihood DS1 search (the golden-run path)

Each config runs independently and failures are recorded, not raised, so
one broken path cannot hide the others' numbers.
"""
import json
import sys
import time

DATA = "/root/reference/data"


def _best_of(fn, reps=5):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def config1_hello():
    """hello.fasta + hello.nwk JC69 LL (reference
    src/unrooted_sbn_instance.hpp:243; golden LL -84.852358)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bito_tpu.core.newick import parse_newick_file, read_fasta
    from bito_tpu.core.site_pattern import SitePattern
    from bito_tpu.models.phylo_model import (
        PhyloModel,
        PhyloModelSpecification,
    )
    from bito_tpu.treelike.engine import TreeLikelihoodEngine

    coll = parse_newick_file(f"{DATA}/hello.nwk")
    seqs = read_fasta(f"{DATA}/hello.fasta")
    engine = TreeLikelihoodEngine(SitePattern(seqs, coll.taxon_names),
                                  PhyloModel(PhyloModelSpecification()))
    trees = coll.trees
    ll = np.asarray(engine.log_likelihoods(trees, {}))
    parity = abs(float(ll[0]) - (-84.852358))
    assert parity < 1e-3, ll

    iters = 200
    enc = engine.encode(trees + trees)  # even batch for the kernel path
    bl = engine.branch_length_matrix(trees + trees, enc)
    eig, rates, props, clock = engine._model_ingredients({}, 2)

    kernel = ("pallas" if engine._use_pallas(True) else "scan")

    @jax.jit
    def sweep(b):
        def body(carry, k):
            if kernel == "pallas":
                from bito_tpu.treelike import pallas_chunked, pallas_pruning

                rates_p, props_p = engine._pad_model_ingredients(
                    eig, rates, props)
                P_blk, tips_flat, piprop, w = pallas_pruning.prepare_inputs(
                    enc, engine._pallas_tips(), engine.site_pattern.weights,
                    eig, rates_p, props_p, clock, b * (1.0 + 0.001 * k),
                    engine.pattern_pad)
                ce, cdst, ctip, cpost_e, _ = engine._chunked_encoding(enc)
                lls = pallas_chunked.chunked_log_likelihoods(
                    cdst, ctip, P_blk, cpost_e, tips_flat, piprop, w,
                    Mc=ce.Mc, W=ce.W, T=ce.num_taxa,
                    CA=engine._padded_categories() * 4,
                    s_tile=engine._pallas_s_tile())
            else:
                from bito_tpu.treelike import pruning

                lls = pruning.log_likelihoods_impl(
                    jnp.asarray(enc.post_ops), jnp.asarray(enc.root),
                    engine.tip_partials, engine.weights,
                    b * (1.0 + 0.001 * k), eig, rates, props, clock,
                    num_slots=enc.num_slots,
                    pattern_pad=engine.pattern_pad,
                    category_count=engine.model.category_count)
            return carry + lls.sum(), 0.0

        total, _ = jax.lax.scan(body, jnp.zeros((), bl.dtype),
                                jnp.arange(iters, dtype=bl.dtype))
        return total

    sweep(bl).block_until_ready()
    best = _best_of(lambda: sweep(bl * 1.0001).block_until_ready())
    return {
        "metric": "hello JC69 single-tree LL evals/sec",
        "value": round(2 * iters / best, 2),
        "unit": "evals/sec",
        "parity_abs": parity,
        "kernel": kernel,
    }


def config3_gp():
    """GP engine: populate + per-PCSP likelihoods per dispatch and one
    branch-optimization sweep on the DS1.subsampled_10 DAG (reference
    src/gp_instance.cpp:303-309 timing hooks)."""
    from bito_tpu.api.gp import gp_instance
    from bito_tpu.utils.timing import PhaseTimer

    timer = PhaseTimer()
    inst = gp_instance("")
    inst.read_fasta_file(f"{DATA}/ds1/ds1.fasta")
    inst.read_newick_file(
        f"{DATA}/ds1/ds1.credible.with-branches.rerooted.nwk")
    with timer.phase("make_dag"):
        inst.make_dag()
    with timer.phase("make_engine+first_populate"):
        inst.make_gp_engine()
        inst.populate_plvs()
        inst.compute_likelihoods()
    eng = inst.get_gp_engine()

    def populate_pass():
        eng.populate_plvs()
        eng.compute_likelihoods()
        eng.per_gpcsp_log_likelihoods()

    populate_pass()
    t_pop = _best_of(populate_pass)

    def opt_sweep():
        import numpy as np

        eng.optimize_branch_lengths_once()
        np.asarray(eng.branch_lengths)  # block on the async dispatch

    with timer.phase("opt_compile"):
        opt_sweep()
    t_opt = _best_of(opt_sweep)
    marg = float(inst.get_log_marginal_likelihood())
    return {
        "metric": "GP DS1-credible populate+per-PCSP ms/pass",
        "value": round(t_pop * 1e3, 2),
        "unit": "ms",
        "optimize_ms": round(t_opt * 1e3, 2),
        "edges": int(eng.dag.edge_count()),
        "log_marginal": marg,
        "phases": {k: round(v, 3) for k, v in timer.totals.items()},
    }


def config4_vbpi():
    """VBPI 20-particle gradient step on DS1 (vip/benchmark.py:18-82)."""
    from bito_tpu.models.phylo_model import PhyloModelSpecification
    from bito_tpu.vi.burrito import Burrito

    burro = Burrito(
        mcmc_nexus_path=f"{DATA}/DS1.subsampled_10.t",
        burn_in_fraction=0.0,
        fasta_path=f"{DATA}/DS1.fasta",
        phylo_model_specification=PhyloModelSpecification(
            substitution="JC69", site="constant", clock="strict"),
        branch_model_name="split",
        scalar_model_name="lognormal",
        optimizer_name="simple",
        particle_count=20,
        thread_count=1,
    )
    burro.gradient_step()  # warm up (compiles)
    best = _best_of(lambda: burro.gradient_step(), reps=5)
    return {
        "metric": "VBPI DS1 20-particle gradient step",
        "value": round(best * 1e3, 2),
        "unit": "ms/step",
    }


def config5_nni():
    """End-to-end NNI search iterations/sec (reference
    src/nni_engine.cpp:230-257 Run loop): GP-scored six_taxon to
    completion, and 20 iterations of the faithful TP-likelihood DS1
    search (the golden-run product path)."""
    from bito_tpu.api.gp import gp_instance

    out = {}
    # six_taxon, GP scoring, run to completion
    inst = gp_instance("")
    inst.read_fasta_file(f"{DATA}/six_taxon.fasta")
    inst.read_newick_file(f"{DATA}/six_taxon_rooted_simple.nwk")
    inst.make_dag()
    inst.make_gp_engine()
    inst.take_first_branch_length()
    eng = inst.make_nni_engine("gp_likelihood")
    eng.set_top_k_score_filtering_scheme(1)
    t0 = time.perf_counter()
    eng.run_init()
    iters = 0
    while iters < 10 and eng.adjacent_nni_count():
        if not eng.run_main_loop():
            break
        iters += 1
    t_six = time.perf_counter() - t0
    out["six_taxon_gp_iters"] = iters
    out["six_taxon_gp_iters_per_sec"] = round(iters / t_six, 3)

    # DS1 faithful TP-likelihood search, 20 iterations.  The faithful
    # path's precision contract is f64, which the TPU does not support:
    # enable x64 and pin this part to the host CPU backend (the batched
    # scorer otherwise silently falls back to the serial oracle).
    import jax

    from bito_tpu.nni.golden import golden_nni_search

    jax.config.update("jax_enable_x64", True)
    cpu = jax.devices("cpu")[0]
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        search = golden_nni_search(
            f"{DATA}/ds1/ds1.fasta", f"{DATA}/ds1/ds1.top1.nwk",
            iter_max=20, opt_max=1)
    t_ds1 = time.perf_counter() - t0
    out.update({
        "metric": "NNI search iterations/sec (DS1 TP-likelihood, 20 it)",
        "value": round(20 / t_ds1, 3),
        "unit": "iters/sec",
        "ds1_acceptances": len(search.records),
    })
    return out


def run_all(outfile="BENCH_CONFIGS.json"):
    results = {}
    for name, fn in (("config1_hello_jc69", config1_hello),
                     ("config3_gp_ds1", config3_gp),
                     ("config4_vbpi_ds1", config4_vbpi),
                     ("config5_nni_search", config5_nni)):
        t0 = time.perf_counter()
        try:
            results[name] = fn()
        except Exception as exc:  # record, don't break the flagship bench
            results[name] = {"error": f"{type(exc).__name__}: {exc}"}
        results[name]["wall_s"] = round(time.perf_counter() - t0, 1)
        print(f"# {name}: {json.dumps(results[name])}", file=sys.stderr)
    with open(outfile, "w") as f:
        json.dump(results, f, indent=1)
    return results


if __name__ == "__main__":
    run_all()
