"""bito_tpu: a TPU-native phylogenetic likelihood + variational-inference
framework with the capabilities of phylovi/bito.

Public surface mirrors the reference pybind module `bito`
(reference: src/pybito.cpp:91-1288): instances, tree collections, model
specifications, and bitset factories, with the compute path rebuilt on
JAX/XLA (batched Felsenstein pruning, levelized subsplit-DAG wavefronts,
pjit site-pattern sharding) instead of BEAGLE/Eigen.
"""

from .api.instances import (
    GenericSBNInstance,
    PhyloGradient,
    RootedSBNInstance,
    UnrootedSBNInstance,
    rooted_instance,
    unrooted_instance,
)
from .core.bitset import PCSP, Subsplit
from .core.newick import (
    parse_newick_file,
    parse_newick_text,
    parse_nexus_file,
    read_fasta,
)
from .core.site_pattern import SitePattern
from .core.tree import Topology, Tree, TreeCollection
from .models.phylo_model import PhyloModel, PhyloModelSpecification

__version__ = "0.1.0"

__all__ = [
    "GenericSBNInstance",
    "PhyloGradient",
    "RootedSBNInstance",
    "UnrootedSBNInstance",
    "rooted_instance",
    "unrooted_instance",
    "PCSP",
    "Subsplit",
    "parse_newick_file",
    "parse_newick_text",
    "parse_nexus_file",
    "read_fasta",
    "SitePattern",
    "Topology",
    "Tree",
    "TreeCollection",
    "PhyloModel",
    "PhyloModelSpecification",
]
