"""Bounded probe of the 4-state paired kernel's ~0.35 us/op floor
(VERDICT round-4 task 4, final structural question): is the floor the
DYNAMIC-offset VMEM access groups (Mosaic dependence analysis
serializing store->load chains), or the sequenced-op issue cost itself?

OUTCOME (round 5, recorded): INCONCLUSIVE — every harness variant
measured times below the MXU lower bound of the emulated op chain
(e.g. 0.13 ms for 6,240 chained [32,96]@[96,1024] dots whose MXU floor
is ~1.3 ms), i.e. the Mosaic/XLA pipeline eliminates or collapses the
synthetic chain in ways the production kernel's data flow prevents.
The plateau certification therefore rests on the round-4 intervention
ladder (dot count, store count, VMEM, interleave width, chunked
level-sync — all within +-4%) plus the round-5 roofline lines in
bench.py (0.42% MFU, latency-bound); the productive answer was shifting
the perf frontier to the codon regime (bandwidth-bound, ~85% of HBM
peak, 10.1k evals/s).  Kept for the record and as a starting point if a
future round reopens the persistent-kernel question.

Method: one pallas kernel runs R repetitions of an M=52-op chain (each
op: load [2CA, S] pair rows, a [2CA, 6CA]@[6CA, S] dot emulating the
K-stacked evolve, elementwise product, store [CA, S]) entirely on-core;
per-op cost is the SLOPE between two R values (launch/init cost cancels).
Variants: dynamic offsets from an SMEM tape vs compile-time offsets
(fully unrolled).  Shapes mirror the production kernel (CA=16, S=1024,
f32 scratch, bf16-ish dot operands).
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CA = 16
S = 1024
M = 52
NS = 2 * M + 3


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _kernel(tape_ref, L_ref, out_ref, buf, *, dynamic: bool, R: int):
    buf[...] = jnp.ones_like(buf)
    L = L_ref[0]

    def chain(_r, tok):
        if dynamic:
            def body(m, t):
                src = tape_ref[0, m] * CA
                dst = tape_ref[1, m] * CA
                rows = buf[pl.ds(src, 2 * CA), :] + t
                stacked = jnp.concatenate([rows, rows, rows], axis=0)
                ev = _dot(L, stacked)
                buf[pl.ds(dst, CA), :] = ev[0:CA] * ev[CA:2 * CA]
                return t * 0.5

            return jax.lax.fori_loop(0, M, body, tok)
        t = tok
        for m in range(M):
            src = (2 * m) * CA
            dst = (2 * (m + 1)) * CA
            rows = buf[src:src + 2 * CA, :] + t
            stacked = jnp.concatenate([rows, rows, rows], axis=0)
            ev = _dot(L, stacked)
            buf[dst:dst + CA, :] = ev[0:CA] * ev[CA:2 * CA]
            t = t * 0.5
        return t

    tok = jax.lax.fori_loop(0, R, chain, jnp.float32(1e-8))
    out_ref[...] = buf[2 * M * CA:2 * M * CA + 8, :] + tok


def build(dynamic, R):
    tape = np.zeros((2, M), np.int32)
    for m in range(M):
        tape[0, m] = 2 * m
        tape[1, m] = 2 * (m + 1)
    L = np.random.default_rng(0).normal(
        0, 0.05, (1, 2 * CA, 6 * CA)).astype(np.float32)

    call = pl.pallas_call(
        functools.partial(_kernel, dynamic=dynamic, R=R),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((2, M), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2 * CA, 6 * CA), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, S), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NS * CA, S), jnp.float32)],
    )
    fn = jax.jit(lambda Lx: call(jnp.asarray(tape), Lx))
    return fn, jnp.asarray(L)


def timed(dynamic, R):
    fn, L = build(dynamic, R)
    fn(L).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn(L).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


if __name__ == "__main__":
    for dyn in (True, False):
        try:
            t1 = timed(dyn, 20)
            t2 = timed(dyn, 120)
            per_op = (t2 - t1) / ((120 - 20) * M)
            print(json.dumps({
                "dynamic": dyn,
                "R20_ms": round(t1 * 1e3, 3),
                "R120_ms": round(t2 * 1e3, 3),
                "us_per_op_slope": round(per_op * 1e6, 4),
            }), flush=True)
        except Exception as exc:
            print(json.dumps({"dynamic": dyn,
                              "error": str(exc)[:300]}), flush=True)
