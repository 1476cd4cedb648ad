"""Worker payload for the 2-process multi-host CPU emulation test.

Run via: python -m bito_tpu.dist.launch -n 2 --devices-per-process 2 \
             tests/multihost_worker.py

Proves cross-process parity (SURVEY §5.8 / P6): classical-engine LL +
branch gradients and the GP marginal computed over the global
2-process x 2-device mesh match the same quantities computed locally
(unsharded) in each process.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from bito_tpu.dist import multihost  # noqa: E402

multihost.initialize()

import numpy as np  # noqa: E402

from bito_tpu.core.newick import parse_newick_file, read_fasta  # noqa: E402
from bito_tpu.core.site_pattern import SitePattern  # noqa: E402
from bito_tpu.models.phylo_model import (  # noqa: E402
    PhyloModel, PhyloModelSpecification)
from bito_tpu.treelike.engine import TreeLikelihoodEngine  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

DATA = "/root/reference/data"
coll = parse_newick_file(f"{DATA}/ds1-reduced-5.nwk")
seqs = read_fasta(f"{DATA}/ds1-reduced-5.fasta")
sp = SitePattern(seqs, coll.taxon_names)
# The file carries zero branch lengths (topology-only); use nonzero values
# so parity is checked on finite likelihoods.
rng = np.random.default_rng(7)
for t in coll.trees:
    t.branch_lengths[:] = rng.uniform(0.01, 0.3, len(t.branch_lengths))

# Local (unsharded) truth, computed independently in each process.
local = TreeLikelihoodEngine(sp, PhyloModel(PhyloModelSpecification()))
ll_local, g_local = local.ll_and_branch_gradients(coll.trees, {})
ll_local, g_local = np.asarray(ll_local), np.asarray(g_local)

# Global-mesh computation: patterns sharded across both processes' devices.
mesh = multihost.global_mesh()
eng = TreeLikelihoodEngine(sp, PhyloModel(PhyloModelSpecification()))
eng.shard_patterns(mesh)
ll_g, g_g = eng.ll_and_branch_gradients(coll.trees, {})
np.testing.assert_allclose(np.asarray(ll_g), ll_local, atol=1e-9)
np.testing.assert_allclose(np.asarray(g_g), g_local, atol=1e-8)
print(f"proc {jax.process_index()}: classical LL+grad parity OK "
      f"(ll[0]={ll_local[0]:.6f})", flush=True)

# GP engine: marginal parity across the global mesh.
from bito_tpu.api.gp import gp_instance  # noqa: E402


def build():
    inst = gp_instance("mh")
    inst.read_fasta_file(f"{DATA}/ds1-reduced-5.fasta")
    inst.read_newick_file(f"{DATA}/ds1-reduced-5.nwk")
    inst.make_gp_engine()
    return inst


ref = build()
ref.populate_plvs()
ref.compute_likelihoods()
m_local = ref.get_log_marginal_likelihood()

sharded = build()
sharded.get_gp_engine().shard_patterns(mesh)
sharded.populate_plvs()
sharded.compute_likelihoods()
m_global = sharded.get_log_marginal_likelihood()
np.testing.assert_allclose(m_global, m_local, atol=1e-9)
print(f"proc {jax.process_index()}: GP marginal parity OK "
      f"({m_global:.6f})", flush=True)
print(f"proc {jax.process_index()}: MULTIHOST-PARITY-OK", flush=True)
