"""Instance facades mirroring bito's Python API surface.

TPU-native rebuild of GenericSBNInstance / UnrootedSBNInstance /
RootedSBNInstance (reference: src/generic_sbn_instance.hpp:1-502,
src/unrooted_sbn_instance.{hpp,cpp}, src/rooted_sbn_instance.{hpp,cpp},
bound in src/pybito.cpp:91-700).  A bito user's workflow maps one-to-one:

    inst = bito_tpu.unrooted_instance("name")
    inst.read_newick_file(path); inst.read_fasta_file(path)
    inst.process_loaded_trees(); inst.train_simple_average()
    inst.sample_trees(k)
    inst.prepare_for_phylo_likelihood(spec, thread_count)
    inst.log_likelihoods(); inst.phylo_gradients()
    inst.topology_gradients(log_f, use_vimco)

The "engine" underneath is the batched XLA program (treelike/pruning.py), so
thread_count and beagle flags are accepted-and-ignored.
"""
from __future__ import annotations

import csv as _csv
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..core.newick import (
    parse_newick_file,
    parse_newick_text,
    parse_nexus_file,
    read_fasta,
)
from ..core.site_pattern import SitePattern
from ..core.tree import Topology, Tree, TreeCollection
from ..models.phylo_model import PhyloModel, PhyloModelSpecification
from ..sbn import gradients as sbn_gradients
from ..sbn import probability as sbn_probability
from ..sbn.psp import PSPIndexer
from ..sbn.sampler import TopologySampler
from ..sbn.support import SBNSupport, build_support
from ..treelike.engine import TreeLikelihoodEngine

DOUBLE_MINIMUM = np.finfo(np.float64).min


class PhyloGradient:
    """Mirror of bito.PhyloGradient (src/phylo_gradient.hpp): a log
    likelihood plus a string->vector gradient map."""

    def __init__(self, log_likelihood: float, gradient: Dict[str, np.ndarray]):
        self.log_likelihood_ = float(log_likelihood)
        self.gradient_ = gradient

    def log_likelihood(self) -> float:
        return self.log_likelihood_

    @property
    def gradient(self) -> Dict[str, np.ndarray]:
        return self.gradient_


class GenericSBNInstance:
    rooted: bool = False

    def __init__(self, name: str = "instance"):
        self.name = name
        self.tree_collection: Optional[TreeCollection] = None
        self.alignment: Dict[str, str] = {}
        self.sbn_support: Optional[SBNSupport] = None
        self.sbn_parameters: np.ndarray = np.zeros(0)
        self.psp_indexer: Optional[PSPIndexer] = None
        self.engine: Optional[TreeLikelihoodEngine] = None
        self.phylo_model: Optional[PhyloModel] = None
        self.phylo_model_params: Optional[np.ndarray] = None
        self.rescaling = True
        self.rng = np.random.default_rng(0)
        self._topology_counter = None

    # -- io -------------------------------------------------------------
    def read_newick_file(self, path: str, sort_taxa: bool = False):
        self.tree_collection = parse_newick_file(path, sort_taxa=sort_taxa)

    def read_nexus_file(self, path: str, sort_taxa: bool = False):
        self.tree_collection = parse_nexus_file(path, sort_taxa=sort_taxa)

    def read_fasta_file(self, path: str):
        self.alignment = read_fasta(path)
        self._invalidate_engine()

    def tree_count(self) -> int:
        return len(self.tree_collection) if self.tree_collection else 0

    def taxon_names(self) -> List[str]:
        return list(self.tree_collection.taxon_names)

    # -- SBN support and training ---------------------------------------
    def process_loaded_trees(self):
        assert self.tree_collection is not None, "Load some trees first"
        counter = {}
        topo_by_key = {}
        for t in self.tree_collection.trees:
            k = t.topology.key()
            counter[k] = counter.get(k, 0) + 1
            topo_by_key[k] = t.topology
        self._topology_counter = {
            topo_by_key[k]: c for k, c in counter.items()
        }
        self.sbn_support = build_support(
            self._topology_counter, self.tree_collection.taxon_names,
            rooted=self.rooted,
        )
        self.sbn_parameters = np.ones(self.sbn_support.size())
        self.psp_indexer = PSPIndexer(self.sbn_support)

    def split_counters(self):
        """[rootsplit_support, subsplit_support] keyed by pretty strings
        (reference inst.split_counters(), src/pybito.cpp)."""
        from ..sbn import maps as sbn_maps

        counters = (
            sbn_maps.rooted_counters(self._topology_counter)
            if self.rooted
            else sbn_maps.unrooted_counters(self._topology_counter)
        )
        rs_counter, pcsp_counter, rs_bits, pcsp_bits = counters
        n = len(self.tree_collection.taxon_names)
        # Raw bitset-string keys, like the reference's ToString() maps
        # (src/sbn_maps.cpp StringPCSPMapOf): parent = 2n chars as stored in
        # the PCSP (sister|focal order), child = the stored n-char min clade.
        rootsplit = dict(rs_counter)
        subsplit: Dict[str, Dict[str, int]] = {}
        for k, v in pcsp_counter.items():
            parent = k[: 2 * n]
            child = k[2 * n:]
            subsplit.setdefault(parent, {})[child] = v
        return [rootsplit, subsplit]

    def make_indexer_representations(self):
        return [
            self.sbn_support.indexer_representation_of(t.topology)
            for t in self.tree_collection.trees
        ]

    def make_psp_indexer_representations(self):
        return [
            self.psp_indexer.representation_of(t.topology)
            for t in self.tree_collection.trees
        ]

    def _representation_counter(self):
        reps, counts = [], []
        for topo, count in self._topology_counter.items():
            reps.append(self.sbn_support.indexer_representation_of(topo))
            counts.append(count)
        return reps, counts

    def train_simple_average(self):
        reps, counts = self._representation_counter()
        self.sbn_parameters = sbn_probability.simple_average(
            self.sbn_support, reps, counts
        )

    def calculate_sbn_probabilities(self) -> np.ndarray:
        norm = sbn_probability.normalize_in_log(
            self.sbn_parameters, self.sbn_support
        )
        return sbn_probability.probabilities_of_collection(
            self.sbn_support, norm, self.make_indexer_representations()
        )

    def normalized_sbn_parameters(self) -> np.ndarray:
        return np.exp(
            sbn_probability.normalize_in_log(self.sbn_parameters,
                                             self.sbn_support)
        )

    def pretty_indexer(self) -> List[str]:
        return self.sbn_support.pretty_indexer()

    def pretty_indexed_sbn_parameters(self):
        return list(zip(self.pretty_indexer(),
                        self.normalized_sbn_parameters()))

    def sbn_parameters_to_csv(self, path: str):
        with open(path, "w", newline="") as f:
            w = _csv.writer(f)
            for key, val in self.pretty_indexed_sbn_parameters():
                w.writerow([key, repr(float(val))])

    def read_sbn_parameters_from_csv(self, path: str):
        with open(path, newline="") as f:
            pretty = {row[0]: float(row[1]) for row in _csv.reader(f) if row}
        self.set_sbn_parameters(pretty)

    def set_sbn_parameters(self, pretty_sbn_parameters: Dict[str, float],
                           warn_missing: bool = True):
        """Reference GenericSBNInstance::SetSBNParameters
        (src/generic_sbn_instance.hpp:115-148): linear-space input."""
        missing = 0
        out = np.empty(self.sbn_support.size())
        for i, key in enumerate(self.pretty_indexer()):
            v = pretty_sbn_parameters.get(key)
            if v is None:
                out[i] = DOUBLE_MINIMUM
                missing += 1
            elif v > 0:
                out[i] = np.log(v)
            elif v == 0:
                out[i] = DOUBLE_MINIMUM
            else:
                raise ValueError(
                    "Negative probability in set_sbn_parameters; expected "
                    "linear (not log) space"
                )
        if warn_missing and missing:
            print(f"Warning: {missing} SBN parameters in support but not "
                  f"specified; set to log-zero sentinel.")
        self.sbn_parameters = out

    # -- sampling --------------------------------------------------------
    def sample_topology(self) -> Topology:
        sampler = TopologySampler(self.sbn_support, self.rng)
        probs = self.normalized_sbn_parameters()
        return sampler.sample(probs, rooted=self.rooted)

    def sample_trees(self, count: int):
        assert self.sbn_support is not None
        sampler = TopologySampler(self.sbn_support, self.rng)
        probs = self.normalized_sbn_parameters()
        trees = []
        for _ in range(count):
            topo = sampler.sample(probs, rooted=self.rooted)
            trees.append(Tree(topo, np.zeros(topo.num_nodes)))
        self.tree_collection = TreeCollection(
            trees, self.tree_collection.taxon_names
        )

    # -- likelihood engine ----------------------------------------------
    def _invalidate_engine(self):
        self.engine = None

    def prepare_for_phylo_likelihood(
        self, specification: PhyloModelSpecification, thread_count: int = 1,
        beagle_flags: Sequence[int] = (), use_tip_states: bool = True,
        tree_count_option: Optional[int] = None,
    ):
        assert self.alignment, "Read a fasta file first"
        assert self.tree_collection is not None, "Load trees first"
        self.phylo_model = PhyloModel(specification)
        sp = SitePattern(self.alignment, self.tree_collection.taxon_names)
        self.engine = TreeLikelihoodEngine(sp, self.phylo_model)
        count = tree_count_option or len(self.tree_collection)
        base = self.phylo_model.default_param_vector()
        self.phylo_model_params = np.tile(base, (count, 1))

    def get_phylo_model_params(self) -> np.ndarray:
        return self.phylo_model_params

    def get_phylo_model_param_block_map(self) -> Dict[str, np.ndarray]:
        """Zero-copy views into the per-tree parameter matrix (reference
        GetPhyloModelParamBlockMap)."""
        out = {}
        for key, (start, length) in self.phylo_model.blocks.items():
            out[key] = self.phylo_model_params[:, start:start + length]
        return out

    def _params_dict(self):
        count = len(self.tree_collection)
        mat = self.phylo_model_params
        if mat.shape[0] != count:
            mat = np.tile(mat[:1], (count, 1))
        d = {}
        for key, (start, length) in self.phylo_model.blocks.items():
            d[key] = jnp.asarray(mat[:, start:start + length])
        return d

    def log_likelihoods(self) -> np.ndarray:
        assert self.engine is not None, "prepare_for_phylo_likelihood first"
        return np.asarray(
            self.engine.log_likelihoods(
                self.tree_collection.trees, self._params_dict()
            )
        )

    def phylo_gradients(self) -> List[PhyloGradient]:
        assert self.engine is not None, "prepare_for_phylo_likelihood first"
        trees = self.tree_collection.trees
        ll, grads = self.engine.ll_and_branch_gradients(
            trees, self._params_dict()
        )
        ll = np.asarray(ll)
        grads = np.asarray(grads)
        out = []
        for b, t in enumerate(trees):
            n_edges = t.topology.num_nodes
            out.append(
                PhyloGradient(
                    ll[b],
                    {"branch_lengths": grads[b, :n_edges].copy()},
                )
            )
        return out


class UnrootedSBNInstance(GenericSBNInstance):
    rooted = False

    def train_expectation_maximization(self, alpha: float, max_iter: int,
                                       score_epsilon: float = 0.0):
        reps, counts = self._representation_counter()
        self.sbn_parameters, score = sbn_probability.expectation_maximization(
            self.sbn_support, reps, counts, alpha, max_iter, score_epsilon
        )
        return score

    def topology_gradients(self, log_f: np.ndarray, use_vimco: bool = True
                           ) -> np.ndarray:
        reps = self.make_indexer_representations()
        return sbn_gradients.topology_gradients(
            self.sbn_support, self.sbn_parameters, reps, np.asarray(log_f),
            use_vimco=use_vimco,
        )

    def split_lengths(self):
        result = [[] for _ in range(self.psp_indexer.after_rootsplits_index)]
        for t in self.tree_collection.trees:
            split_idx = self.psp_indexer.representation_of(t.topology)[0]
            for edge, idx in enumerate(split_idx):
                result[idx].append(float(t.branch_lengths[edge]))
        return result


class RootedSBNInstance(GenericSBNInstance):
    rooted = True


def unrooted_instance(name: str = "instance") -> UnrootedSBNInstance:
    return UnrootedSBNInstance(name)


def rooted_instance(name: str = "instance") -> RootedSBNInstance:
    return RootedSBNInstance(name)
