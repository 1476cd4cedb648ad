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
