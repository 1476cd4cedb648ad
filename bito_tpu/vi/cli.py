"""The ``vip``-equivalent command line interface
(reference: vip/cli.py:1-154): `benchmark` (MCMC-reference ELBO fitting)
and `dag-to-dot`."""
import pprint

import click


@click.group()
def cli_benchmark():
    pass


@cli_benchmark.command(name="benchmark")
@click.option("--branch-model", type=click.Choice(["split", "psp"]),
              default="split", show_default=True)
@click.option(
    "--scalar-model",
    type=click.Choice(["lognormal", "tf_lognormal", "tf_truncated_lognormal",
                       "tf_gamma", "jax_lognormal",
                       "jax_truncated_lognormal", "jax_gamma"]),
    default="lognormal", show_default=True,
)
@click.option("--optimizer", type=click.Choice(["simple", "bump"]),
              default="simple", show_default=True)
@click.option("--step-count", default=5, show_default=True,
              help="Number of gradient descent steps to take.")
@click.option("--particle-count", default=10, show_default=True,
              help="Number of particles for stochastic gradient estimation.")
@click.option("--thread-count", default=4, show_default=True,
              help="Accepted for bito compatibility (batching replaces threads).")
@click.option("--out-prefix", default=None,
              help="Path prefix to which output should be saved.")
@click.argument("data-path")
def benchmark(branch_model, scalar_model, optimizer, step_count,
              particle_count, thread_count, out_prefix, data_path):
    """Do a benchmarking comparison to an MCMC run.

    DATA_PATH is a directory named X containing X_out.t (an MCMC run on a
    fixed topology) and X.fasta (the sequence data).
    """
    from . import benchmark as benchmark_mod

    print("Starting validation:")
    pprint.pprint(locals())
    run_details, opt_trace, fitting_results = benchmark_mod.fixed(
        data_path,
        branch_model_name=branch_model,
        scalar_model_name=scalar_model,
        optimizer_name=optimizer,
        step_count=step_count,
        particle_count=particle_count,
        thread_count=thread_count,
    )
    if out_prefix is not None:
        opt_trace.to_csv(out_prefix + "_opt_trace.csv")
        fitting_results.to_csv(out_prefix + "_fitting_results.csv")
    pprint.pprint(run_details)


@click.group()
def cli_dag_to_dot():
    pass


@cli_dag_to_dot.command(name="dag-to-dot")
@click.option("-fasta", "--fasta-path", required=True,
              type=click.Path(exists=True))
@click.option("-newick", "--newick-path", required=True,
              type=click.Path(exists=True))
@click.option("-output", "--output-path", required=True, type=click.Path())
@click.option("-edges", "--edge-labels", default=False, show_default=True)
def dag_to_dot(fasta_path, newick_path, output_path, edge_labels):
    """Convert a subsplit DAG to a .dot file (and .svg when graphviz is
    installed)."""
    from ..api.gp import gp_instance

    inst = gp_instance("")
    inst.read_fasta_file(fasta_path)
    inst.read_newick_file(newick_path)
    inst.make_dag()
    inst.subsplit_dag_to_dot(output_path, edge_labels)
    try:
        import graphviz

        graphviz.render("dot", "svg", output_path)
    except Exception as exc:  # graphviz package or dot binary missing
        print(f"graphviz rendering unavailable ({exc}); "
              f"wrote {output_path} only")


cli = click.CommandCollection(sources=[cli_benchmark, cli_dag_to_dot])

if __name__ == "__main__":
    cli()
