"""Measure A=64 codon-model LL+gradient throughput on TPU: the MXU-bound
regime ([64C, 64C] evolves) the 4-state latency-bound case never reaches.
27-taxon trees (DS1 topologies), 300 codon patterns, batch 50."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from bito_tpu.core.newick import parse_nexus_file
from bito_tpu.models import codon as cd

coll = parse_nexus_file("/root/reference/data/DS1.subsampled_10.t")
B, S = 50, 300
topos = [coll.trees[i % len(coll.trees)].topology for i in range(B)]
rng = np.random.default_rng(0)
N = max(t.num_nodes for t in topos)
bl = rng.uniform(0.02, 0.5, (B, N)).astype(np.float32)
T = topos[0].num_taxa
states = rng.integers(0, 61, (T, S))
tips = np.zeros((T, S, 64), np.float32)
tips[np.arange(T)[:, None], np.arange(S)[None, :], states] = 1.0
w = np.ones(S, np.float32)
model = cd.CodonModel()
iters = 10

@jax.jit
def sweep(b):
    def body(carry, k):
        ll, g = cd.codon_ll_and_gradients(topos, b * (1 + 1e-3 * k),
                                          tips, w, model)
        return carry + ll.sum() + g.sum(), 0.0
    tot, _ = jax.lax.scan(body, jnp.zeros(()),
                          jnp.arange(iters, dtype=jnp.float32))
    return tot

blj = jnp.asarray(bl)
t0 = time.perf_counter()
v0 = sweep(blj)
v0.block_until_ready()
print(f"compile {time.perf_counter()-t0:.1f}s tot={float(v0):.4f}",
      flush=True)
times = []
for r in range(4):
    arg = (blj * (1 + 1e-4 * (r + 1))).block_until_ready()
    t0 = time.perf_counter()
    v = sweep(arg)
    v.block_until_ready()
    times.append(time.perf_counter() - t0)
    print(f"rep {r}: {times[-1]:.4f}s tot={float(v):.4f}", flush=True)
best = min(times)
rate = B * iters / best
print(f"A=64 MG94 LL+gradient: {rate:.0f} evals/s "
      f"({best/iters*1e3:.1f} ms/batch-eval, B={B}, S={S})", flush=True)
