"""Multi-device sharding tests.

The 8-virtual-CPU-device flag must be set before jax initializes, so these
tests run their payloads in subprocesses with
XLA_FLAGS=--xla_force_host_platform_device_count=8 (the driver's dryrun
environment).  Checks:
  - dryrun_multichip compiles and executes the full training step on an
    8-device mesh
  - sharded (dp-over-sites) log likelihoods match the single-device values
    (SURVEY §4: 1-chip vs N-chip parity with the same schedule)
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_payload(code: str) -> str:
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert out.returncode == 0, f"payload failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


PRELUDE = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert len(jax.devices()) == 8, jax.devices()
"""


class TestMultiDevice:
    def test_dryrun_multichip(self):
        out = run_payload(PRELUDE + """
import importlib.util
spec = importlib.util.spec_from_file_location(
    "ge", %r + "/__graft_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
m.dryrun_multichip(8)
""" % REPO)
        assert "OK" in out

    def test_sharded_ll_matches_single_device(self):
        out = run_payload(PRELUDE + """
import numpy as np
import jax, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec
from bito_tpu.core.newick import parse_newick_file, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.models.phylo_model import PhyloModel, PhyloModelSpecification
from bito_tpu.treelike.engine import TreeLikelihoodEngine
from bito_tpu.dist.mesh import make_mesh

coll = parse_newick_file("/root/reference/data/ds1-reduced-5.nwk")
seqs = read_fasta("/root/reference/data/ds1-reduced-5.fasta")
sp = SitePattern(seqs, coll.taxon_names)
engine = TreeLikelihoodEngine(sp, PhyloModel(PhyloModelSpecification()))
trees = coll.trees
ll_single = np.asarray(engine.log_likelihoods(trees, {}))

mesh = make_mesh(8)
engine.shard_patterns(mesh)
ll_sharded = np.asarray(engine.log_likelihoods(trees, {}))
np.testing.assert_allclose(ll_sharded, ll_single, rtol=0, atol=1e-9)
print("SHARDED-PARITY-OK", ll_sharded[:2])
""")
        assert "SHARDED-PARITY-OK" in out

    def test_sharded_gradients_match(self):
        out = run_payload(PRELUDE + """
import numpy as np
import jax, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec
from bito_tpu.core.newick import parse_newick_file, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.models.phylo_model import PhyloModel, PhyloModelSpecification
from bito_tpu.treelike.engine import TreeLikelihoodEngine
from bito_tpu.dist.mesh import make_mesh

coll = parse_newick_file("/root/reference/data/ds1-reduced-5.nwk")
seqs = read_fasta("/root/reference/data/ds1-reduced-5.fasta")
sp = SitePattern(seqs, coll.taxon_names)
spec = PhyloModelSpecification(substitution="GTR", site="gamma+4")
engine = TreeLikelihoodEngine(sp, PhyloModel(spec))
import jax.numpy as jnp
params = {"substitution_model_rates": jnp.full((6,), 1/6),
          "substitution_model_frequencies": jnp.full((4,), 0.25),
          "site_model_parameters": jnp.asarray([0.7])}
trees = coll.trees
ll1, g1 = engine.ll_and_branch_gradients(trees, params)
ll1, g1 = np.asarray(ll1), np.asarray(g1)
mesh = make_mesh(8)
engine.shard_patterns(mesh)
ll8, g8 = engine.ll_and_branch_gradients(trees, params)
np.testing.assert_allclose(np.asarray(ll8), ll1, atol=1e-9)
np.testing.assert_allclose(np.asarray(g8), g1, atol=1e-8)
print("SHARDED-GRad-OK")
""")
        assert "SHARDED-GRad-OK" in out

    def test_sharded_pallas_kernel_matches_scan(self):
        """SURVEY P2+P5 composed: the paired Pallas kernel runs per-shard
        under shard_map when patterns are sharded (previously any sharded
        run silently dropped to the scan tape)."""
        out = run_payload(PRELUDE + """
import numpy as np
import jax, jax.numpy as jnp
from bito_tpu.core.newick import parse_nexus_file, read_fasta
from bito_tpu.core.site_pattern import SitePattern
from bito_tpu.models.phylo_model import PhyloModel, PhyloModelSpecification
from bito_tpu.treelike.engine import TreeLikelihoodEngine
from bito_tpu.dist.mesh import make_mesh

coll = parse_nexus_file("/root/reference/data/DS1.subsampled_10.t")
seqs = read_fasta("/root/reference/data/DS1.fasta")
sp = SitePattern(seqs, coll.taxon_names)
spec = PhyloModelSpecification(substitution="GTR", site="gamma+4")
params = {"substitution_model_rates": jnp.asarray([0.1,0.3,0.1,0.2,0.25,0.05]),
          "substitution_model_frequencies": jnp.asarray([0.3,0.25,0.2,0.25]),
          "site_model_parameters": jnp.asarray([0.5])}
trees = coll.trees[:4]
ref = TreeLikelihoodEngine(sp, PhyloModel(spec), dtype=jnp.float32)
ref.kernel = "scan"
ll_s, g_s = ref.ll_and_branch_gradients(trees, params)
eng = TreeLikelihoodEngine(sp, PhyloModel(spec), dtype=jnp.float32)
eng.kernel = "pallas_interpret"
eng.shard_patterns(make_mesh(8))
assert eng._use_pallas(True), "sharded paired kernel not selected"
ll_p, g_p = eng.ll_and_branch_gradients(trees, params)
rel_ll = float(jnp.max(jnp.abs((ll_p - ll_s)/ll_s)))
rel_g = float(jnp.max(jnp.abs(g_p - g_s))/jnp.max(jnp.abs(g_s)))
assert rel_ll < 1e-4 and rel_g < 1e-3, (rel_ll, rel_g)
ll_only = eng.log_likelihoods(trees, params)
rel_llo = float(jnp.max(jnp.abs((ll_only - ll_s)/ll_s)))
assert rel_llo < 1e-4, rel_llo
print("SHARDED-PALLAS-OK", rel_ll, rel_g, rel_llo)
""")
        assert "SHARDED-PALLAS-OK" in out

    def test_gp_engine_sharded_matches_single_device(self):
        out = run_payload(PRELUDE + """
import numpy as np
from bito_tpu.api.gp import gp_instance
from bito_tpu.dist.mesh import make_mesh

def build():
    inst = gp_instance("")
    inst.read_fasta_file("/root/reference/data/ds1-reduced-5.fasta")
    inst.read_newick_file("/root/reference/data/ds1-reduced-5.nwk")
    inst.make_dag()
    inst.make_gp_engine()
    return inst

ref = build()
ref.estimate_branch_lengths(1e-4, 5, quiet=True)
ref.populate_plvs(); ref.compute_likelihoods()
m1 = ref.get_log_marginal_likelihood()
bl1 = np.asarray(ref.get_gp_engine().branch_lengths)

sharded = build()
sharded.get_gp_engine().shard_patterns(make_mesh(8))
sharded.estimate_branch_lengths(1e-4, 5, quiet=True)
sharded.populate_plvs(); sharded.compute_likelihoods()
m8 = sharded.get_log_marginal_likelihood()
bl8 = np.asarray(sharded.get_gp_engine().branch_lengths)

np.testing.assert_allclose(m8, m1, atol=1e-9)
np.testing.assert_allclose(bl8, bl1, atol=1e-9)
print("GP-SHARDED-OK", m8)
""")
        assert "GP-SHARDED-OK" in out

    def test_two_process_multihost_parity(self):
        """SURVEY §5.8/P6: a 2-process CPU-emulated multi-host job (2
        virtual devices per process, Gloo collectives) must reproduce the
        single-process LL + gradients + GP marginal."""
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        # The launcher's own heartbeat (no worker output for
        # --stall-timeout) turns a wedged run into a fast, attributable
        # failure with each rank's last output; the outer timeout is only
        # the backstop (round 3's failure mode was a silent 600 s hang).
        out = subprocess.run(
            [sys.executable, "-m", "bito_tpu.dist.launch", "-n", "2",
             "--devices-per-process", "2", "--stall-timeout", "240",
             "tests/multihost_worker.py"],
            env=env, capture_output=True, text=True, timeout=600, cwd=REPO,
        )
        assert out.returncode == 0, f"{out.stdout}\n{out.stderr}"
        assert out.stdout.count("MULTIHOST-PARITY-OK") == 2, out.stdout
