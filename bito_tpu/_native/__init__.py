"""ctypes bindings for the native bitocore library.

Compiled on demand with g++ (cached next to the source); all consumers fall
back to the pure-Python implementations when a toolchain is unavailable, so
the native path is an accelerator, not a dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bitocore.cpp")
_LIB = os.path.join(_HERE, "libbitocore.so")
_lock = threading.Lock()
_lib = None
_unavailable = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _LIB],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _unavailable
    with _lock:
        if _lib is not None:
            return _lib
        if _unavailable:
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _unavailable = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _unavailable = True
            return None
        lib.bc_parse.restype = ctypes.c_void_p
        lib.bc_parse.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.bc_error.restype = ctypes.c_char_p
        lib.bc_error.argtypes = [ctypes.c_void_p]
        lib.bc_num_trees.argtypes = [ctypes.c_void_p]
        lib.bc_num_taxa.argtypes = [ctypes.c_void_p]
        lib.bc_taxon_name.restype = ctypes.c_char_p
        lib.bc_taxon_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.bc_tree_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.bc_tree_data.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ]
        lib.bc_free.argtypes = [ctypes.c_void_p]
        lib.bc_unrooted_counters.restype = ctypes.c_void_p
        lib.bc_unrooted_counters.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
        ]
        lib.bc_counter_error.restype = ctypes.c_char_p
        lib.bc_counter_error.argtypes = [ctypes.c_void_p]
        lib.bc_counter_rootsplit_count.argtypes = [ctypes.c_void_p]
        lib.bc_counter_pcsp_count.argtypes = [ctypes.c_void_p]
        lib.bc_counter_data.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.bc_counter_free.argtypes = [ctypes.c_void_p]
        lib.bc_pcsp_indexer.restype = ctypes.c_void_p
        lib.bc_pcsp_indexer.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.bc_pcsp_indexer_free.argtypes = [ctypes.c_void_p]
        lib.bc_indexer_error.restype = ctypes.c_char_p
        lib.bc_indexer_error.argtypes = [ctypes.c_void_p]
        lib.bc_unrooted_representations.restype = ctypes.c_int
        lib.bc_unrooted_representations.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def parse_trees(text: str, is_nexus: bool):
    """Returns (taxon_names, [(parents, lengths)]) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.bc_parse(text.encode("utf-8"), 1 if is_nexus else 0)
    try:
        err = lib.bc_error(h)
        if err:
            raise ValueError(err.decode())
        taxa = [
            lib.bc_taxon_name(h, i).decode()
            for i in range(lib.bc_num_taxa(h))
        ]
        trees = []
        for t in range(lib.bc_num_trees(h)):
            n = lib.bc_tree_size(h, t)
            parents = np.empty(n, dtype=np.int32)
            lengths = np.empty(n, dtype=np.float64)
            lib.bc_tree_data(
                h, t,
                parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
            trees.append((parents, lengths))
        return taxa, trees
    finally:
        lib.bc_free(h)


def _blocks_to_int(blocks: np.ndarray) -> int:
    out = 0
    for i, b in enumerate(blocks):
        out |= int(b) << (64 * i)
    return out


def unrooted_counters(parent_arrays: List[np.ndarray],
                      topo_counts: List[int], n_taxa: int):
    """Returns (rootsplit_counter, pcsp_counter) with integer-bitset keys:
    rootsplits as (clade0, clade1) ints, pcsps as (sister, focal, child)
    ints, or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    parents = np.concatenate(parent_arrays).astype(np.int32)
    sizes = np.asarray([len(p) for p in parent_arrays], dtype=np.int32)
    counts = np.asarray(topo_counts, dtype=np.int64)
    h = lib.bc_unrooted_counters(
        parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(parent_arrays), n_taxa,
    )
    try:
        err = lib.bc_counter_error(h)
        if err:
            raise ValueError(err.decode())
        nb = (n_taxa + 63) // 64
        n_rs = lib.bc_counter_rootsplit_count(h)
        n_pcsp = lib.bc_counter_pcsp_count(h)
        rs_blocks = np.empty(n_rs * 2 * nb, dtype=np.uint64)
        rs_counts = np.empty(n_rs, dtype=np.int64)
        pcsp_blocks = np.empty(n_pcsp * 3 * nb, dtype=np.uint64)
        pcsp_counts = np.empty(n_pcsp, dtype=np.int64)
        lib.bc_counter_data(
            h,
            rs_blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            rs_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            pcsp_blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            pcsp_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        rs = {}
        for i in range(n_rs):
            row = rs_blocks[i * 2 * nb:(i + 1) * 2 * nb]
            rs[(_blocks_to_int(row[:nb]), _blocks_to_int(row[nb:]))] = int(
                rs_counts[i]
            )
        pcsp = {}
        for i in range(n_pcsp):
            row = pcsp_blocks[i * 3 * nb:(i + 1) * 3 * nb]
            pcsp[(
                _blocks_to_int(row[:nb]),
                _blocks_to_int(row[nb:2 * nb]),
                _blocks_to_int(row[2 * nb:]),
            )] = int(pcsp_counts[i])
        return rs, pcsp
    finally:
        lib.bc_counter_free(h)


def _int_to_blocks(v: int, nb: int, out: np.ndarray):
    mask = (1 << 64) - 1
    for j in range(nb):
        out[j] = (v >> (64 * j)) & mask


class PCSPIndexer:
    """Native PCSP-string -> index map for representation building
    (reference indexer_ of SBNSupport, src/sbn_support.hpp:4-60)."""

    def __init__(self, indexer: Dict[str, int], n_taxa: int):
        lib = get_lib()
        assert lib is not None
        self._lib = lib
        self.n_taxa = n_taxa
        self.nb = (n_taxa + 63) // 64
        count = len(indexer)
        blocks = np.zeros((count, 3 * self.nb), dtype=np.uint64)
        indices = np.empty(count, dtype=np.int64)
        from ..core.bitset import bits_of_string

        for i, (key, idx) in enumerate(indexer.items()):
            for part in range(3):
                v = bits_of_string(key[part * n_taxa:(part + 1) * n_taxa])
                _int_to_blocks(v, self.nb, blocks[i, part * self.nb:
                                                  (part + 1) * self.nb])
            indices[i] = idx
        self._h = lib.bc_pcsp_indexer(
            blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            count, self.nb,
        )

    def __del__(self):
        lib, h = getattr(self, "_lib", None), getattr(self, "_h", None)
        if lib is not None and h:
            lib.bc_pcsp_indexer_free(h)

    def unrooted_representations(self, parent_arrays: List[np.ndarray],
                                 default_index: int) -> List[List[List[int]]]:
        """Per tree: one row per virtual rooting, [rootsplit index, sorted
        PCSP indices...] — the exact output of
        sbn.maps.unrooted_representation."""
        sizes = np.asarray([len(p) for p in parent_arrays], dtype=np.int32)
        assert (sizes == sizes[0]).all(), "trees must share the taxon set"
        N = int(sizes[0])
        row_len = 1 + (N - self.n_taxa)
        rows_per_tree = N - 1
        parents = np.ascontiguousarray(
            np.concatenate(parent_arrays), dtype=np.int32)
        out = np.empty((len(parent_arrays) * rows_per_tree, row_len),
                       dtype=np.int64)
        rc = self._lib.bc_unrooted_representations(
            self._h,
            parents.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(parent_arrays), self.n_taxa, default_index,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if rc != 0:
            err = self._lib.bc_indexer_error(self._h)
            raise ValueError(err.decode() if err else "native rep failure")
        result = []
        for t in range(len(parent_arrays)):
            block = out[t * rows_per_tree:(t + 1) * rows_per_tree]
            result.append([row.tolist() for row in block])
        return result
