"""vip-equivalent benchmark harness + CLI tests
(reference: vip/benchmark.py:18-82, vip/cli.py:1-154)."""
import os
import shutil

import numpy as np
import pytest


@pytest.fixture()
def hello_data_dir(tmp_path, data_dir):
    """Directory named X containing X_out.t and X.fasta (the vip
    benchmark layout)."""
    d = tmp_path / "hello"
    d.mkdir()
    shutil.copy(data_dir / "hello_out.t", d / "hello_out.t")
    shutil.copy(data_dir / "hello.fasta", d / "hello.fasta")
    return str(d)


class TestBenchmarkFixed:
    def test_fixed_runs_and_improves(self, hello_data_dir):
        from bito_tpu.vi.benchmark import fixed

        run_details, opt_trace, fitting_results = fixed(
            hello_data_dir,
            branch_model_name="split",
            scalar_model_name="lognormal",
            optimizer_name="simple",
            step_count=8,
            particle_count=4,
            final_elbo_particle_count=200,
        )
        assert np.isfinite(run_details["final_elbo"])
        assert run_details["gradient_time"] > 0
        # fitting_results has both vb and mcmc rows
        assert set(fitting_results["type"]) == {"vb", "mcmc"}


class TestCLI:
    def test_benchmark_command(self, hello_data_dir, tmp_path):
        from click.testing import CliRunner

        from bito_tpu.vi.cli import cli

        runner = CliRunner()
        out_prefix = str(tmp_path / "run")
        result = runner.invoke(cli, [
            "benchmark", "--step-count", "3", "--particle-count", "3",
            "--out-prefix", out_prefix, hello_data_dir,
        ])
        assert result.exit_code == 0, result.output
        assert os.path.exists(out_prefix + "_opt_trace.csv")
        assert os.path.exists(out_prefix + "_fitting_results.csv")

    def test_dag_to_dot_command(self, tmp_path, data_dir):
        from click.testing import CliRunner

        from bito_tpu.vi.cli import cli

        runner = CliRunner()
        out = str(tmp_path / "dag.dot")
        result = runner.invoke(cli, [
            "dag-to-dot",
            "-fasta", str(data_dir / "hello.fasta"),
            "-newick", str(data_dir / "hello_rooted.nwk"),
            "-output", out,
        ])
        assert result.exit_code == 0, result.output
        assert "digraph" in open(out).read()
