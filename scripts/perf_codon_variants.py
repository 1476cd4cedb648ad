"""Codon kernel variant sweep on TPU (round 5): (group, s_tile) policy,
scan-vs-paired, batch size.  At CA=64 the paired kernel is MXU/bandwidth-
bound (per-op dot [256,512]@[512,tile]), not latency-bound like the
4-state case, so small tiles re-stream the per-op operand stacks once per
pattern tile — the G/tile trade inverts.  One process, sequential runs."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

DATA = "/root/reference/data"


def run(kernel, group, tile, batch):
    import jax
    import jax.numpy as jnp

    from bito_tpu.core.newick import parse_nexus_file, read_fasta
    from bito_tpu.core.site_pattern import CodonSitePattern
    from bito_tpu.models.phylo_model import (
        PhyloModel,
        PhyloModelSpecification,
    )
    from bito_tpu.treelike.engine import TreeLikelihoodEngine

    coll = parse_nexus_file(f"{DATA}/DS1.subsampled_10.t")
    seqs = read_fasta(f"{DATA}/DS1.fasta")
    sp = CodonSitePattern(seqs, coll.taxon_names)
    engine = TreeLikelihoodEngine(
        sp, PhyloModel(PhyloModelSpecification(substitution="MG94")))
    engine.kernel = kernel
    if group is not None:
        engine._paired_tiles = lambda b: (group, tile)
    params = {
        "substitution_model_rates": jnp.asarray([2.5, 0.3]),
        "substitution_model_frequencies": jnp.asarray(
            [0.3, 0.2, 0.3, 0.2]),
    }
    trees = [coll.trees[i % len(coll.trees)] for i in range(batch)]
    iters = 10
    enc = engine.encode(trees)
    bl = engine.branch_length_matrix(trees, enc)
    fn = engine.branch_eval_fn(trees, params)

    @jax.jit
    def sweep(b):
        def body(carry, k):
            ll, g = fn(b * (1.0 + 0.001 * k))
            return carry + ll.sum(), g.sum()

        tot, _ = jax.lax.scan(body, jnp.zeros((), bl.dtype),
                              jnp.arange(iters, dtype=bl.dtype))
        return tot

    t0 = time.perf_counter()
    sweep(bl).block_until_ready()
    compile_s = time.perf_counter() - t0
    times = []
    for r in range(4):
        arg = (bl * (1 + 1e-4 * (r + 1))).block_until_ready()
        t0 = time.perf_counter()
        sweep(arg).block_until_ready()
        times.append(time.perf_counter() - t0)
    rate = batch * iters / min(times)
    return {"kernel": kernel, "group": group, "tile": tile,
            "batch": batch, "rate": round(rate, 1),
            "compile_s": round(compile_s, 1)}


def main():
    configs = [
        ("auto", None, None, 64),    # current heuristic (G=4, tile 128)
        ("auto", 1, 640, 64),
        ("auto", 2, 640, 64),
        ("auto", 2, 320, 64),
        ("auto", 4, 320, 64),
        ("scan", None, None, 64),
        ("auto", 1, 640, 128),
        ("scan", None, None, 128),
    ]
    for cfg in configs:
        try:
            out = run(*cfg)
        except Exception as exc:
            out = {"cfg": cfg, "error": f"{type(exc).__name__}: {exc}"[:200]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
