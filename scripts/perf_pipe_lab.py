"""Minimal pipeline experiments: what does a pallas grid cell cost as a
function of streamed-block size, scratch size, and init writes — with an
(almost) empty body.  Isolates the chunked kernel's 97 us/cell mystery.

Usage: python scripts/perf_pipe_lab.py [expname ...]
"""
import sys
import time
import functools

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELLS = 100
S = 1024
REPS = 40


def run(name, block_rows, scratch_rows, init, loops, stores):
    """block_rows: rows of the streamed bf16 [rows, 128] block per cell;
    scratch_rows: rows of an f32 [rows, S] scratch; init: write whole
    scratch each cell; loops: fori iterations touching scratch; stores:
    dynamic single-[16,S] stores per loop iteration."""

    def kernel(idx_ref, big_ref, out_ref, scratch, acc):
        if init:
            scratch[...] = jnp.ones_like(scratch)

        def body(c, _):
            rows = scratch[pl.ds(16 * (c % 64), 16), :]
            v = rows + 1.0
            for k in range(stores):
                dst = idx_ref[0, 0, (c + k) % 64]
                scratch[pl.ds(dst * 16, 16), :] = v
            return 0

        if loops:
            jax.lax.fori_loop(0, loops, body, 0)
        val = (scratch[pl.ds(0, 8), :]
               + big_ref[0, pl.ds(0, 8), 0:S].astype(jnp.float32))
        out_ref[0] = val

    import numpy as np
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, scratch_rows // 16 - 1,
                                          (CELLS, 1, 64)), jnp.int32)
    big = jnp.ones((CELLS, block_rows, 1024), jnp.bfloat16)

    fn = pl.pallas_call(
        kernel,
        grid=(CELLS,),
        in_specs=[
            pl.BlockSpec((1, 1, 64), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_rows, 1024), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, S), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CELLS, 8, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((scratch_rows, S), jnp.float32),
                        pltpu.VMEM((8, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )

    def squeeze(x):
        return fn(idx, x)

    @jax.jit
    def sweep(x):
        def body(carry, k):
            o = squeeze(x * (1 + 1e-3 * k))
            return carry + o.sum(), 0.0
        tot, _ = jax.lax.scan(body, jnp.zeros(()),
                              jnp.arange(REPS, dtype=jnp.float32))
        return tot

    t0 = time.perf_counter()
    sweep(big).block_until_ready()
    comp = time.perf_counter() - t0
    times = []
    for r in range(4):
        t0 = time.perf_counter()
        sweep(big * (1 + 1e-4 * r)).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    per_cell = best / REPS / CELLS * 1e6
    print(f"{name:34s} compile {comp:5.1f}s {per_cell:8.2f} us/cell",
          flush=True)


def run4d(name, nslices, rows, cols):
    """Stream the same bytes as a [1, nslices, rows, cols] 4-D block vs a
    [1, nslices*rows, cols] 3-D block: is each leading slice a separate
    DMA?"""
    def kernel4(big_ref, out_ref):
        acc = jnp.zeros((8, cols), jnp.float32)
        for o in range(nslices):
            sl = big_ref[0, o].astype(jnp.float32)   # [rows, cols]
            for rblk in range(rows // 8):
                acc = acc + sl[rblk * 8:(rblk + 1) * 8]
        out_ref[0] = acc

    def kernel3(big_ref, out_ref):
        acc = jnp.zeros((8, cols), jnp.float32)
        for o in range(nslices):
            sl = big_ref[0, o * rows:(o + 1) * rows].astype(jnp.float32)
            for rblk in range(rows // 8):
                acc = acc + sl[rblk * 8:(rblk + 1) * 8]
        out_ref[0] = acc

    big4 = jnp.ones((CELLS, nslices, rows, cols), jnp.bfloat16)
    big3 = big4.reshape(CELLS, nslices * rows, cols)
    for tag, arr, kern, spec in (
        ("4d", big4, kernel4,
         pl.BlockSpec((1, nslices, rows, cols), lambda b: (b, 0, 0, 0),
                      memory_space=pltpu.VMEM)),
        ("3d", big3, kernel3,
         pl.BlockSpec((1, nslices * rows, cols), lambda b: (b, 0, 0),
                      memory_space=pltpu.VMEM)),
    ):
        fn = pl.pallas_call(
            kern, grid=(CELLS,), in_specs=[spec],
            out_specs=pl.BlockSpec((1, 8, cols), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CELLS, 8, cols), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )

        @jax.jit
        def sweep(x):
            def body(carry, k):
                return carry + fn(x * (1 + 1e-3 * k)).sum(), 0.0
            tot, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jnp.arange(REPS, dtype=jnp.float32))
            return tot

        sweep(arr).block_until_ready()
        times = []
        for r in range(4):
            t0 = time.perf_counter()
            sweep(arr * (1 + 1e-4 * r)).block_until_ready()
            times.append(time.perf_counter() - t0)
        per_cell = min(times) / REPS / CELLS * 1e6
        print(f"{name}-{tag:31s} {per_cell:8.2f} us/cell", flush=True)


EXPS = {
    # name: (block_rows, scratch_rows, init, loops, stores)
    "tiny-block_tiny-scratch": (8, 128, False, 0, 0),
    "big-block_tiny-scratch": (1024, 128, False, 0, 0),
    "tiny-block_big-scratch": (8, 2080, False, 0, 0),
    "tiny-block_big-scratch_init": (8, 2080, True, 0, 0),
    "big-block_big-scratch_init": (1024, 2080, True, 0, 0),
    "tiny_big_init_loop28": (8, 2080, True, 28, 0),
    "tiny_big_init_loop28_st4": (8, 2080, True, 28, 4),
    "paired-like": (256, 1024, True, 52, 2),
    "double-scratch-4160": (8, 4160, True, 0, 0),
}


def main():
    names = sys.argv[1:] or list(EXPS)
    for n in names:
        if n == "dma4d":
            run4d("dma-32x256x128", 32, 256, 128)
        else:
            run(n, *EXPS[n])


if __name__ == "__main__":
    main()
