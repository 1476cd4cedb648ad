"""Vectorized 1-D optimizers for batched branch-length optimization.

TPU-native rebuild of the reference Optimization namespace
(reference: src/optimization.hpp:13-402): BrentMinimize, GradientAscent,
LogSpaceGradientAscent, NewtonRaphson.  The reference runs one serial line
search per edge inside the op tape; here a whole level's edges are optimized
simultaneously: every lane carries its own Brent/Newton state and the
objective is one batched XLA evaluation per iteration (SURVEY §7 "batched
fixed-iteration bracketed optimization with per-edge convergence masks").

All optimizers work in log-branch-length space with the reference's bounds
(src/dag_branch_handler.hpp:272-294: [-13.9, 1.1], 10 significant digits,
max 1000 iterations -- we run a fixed iteration count, which exceeds Brent's
convergence needs on these unimodal objectives).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

GOLDEN = 0.3819660112501051  # 2 - golden ratio


def brent_minimize_batched(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    iterations: int = 60,
    tolerance: float = 1e-10,
) -> jnp.ndarray:
    """Brent's method (parabolic interpolation + golden section), vectorized:
    each lane of lo/hi is an independent minimization of f (batched)."""
    x = lo + GOLDEN * (hi - lo)
    fx = f(x)
    state = dict(
        a=lo, b=hi, x=x, w=x, v=x, fx=fx, fw=fx, fv=fx,
        d=jnp.zeros_like(x), e=jnp.zeros_like(x),
    )

    def body(_, s):
        a, b, x, w, v = s["a"], s["b"], s["x"], s["w"], s["v"]
        fx, fw, fv, d, e = s["fx"], s["fw"], s["fv"], s["d"], s["e"]
        m = 0.5 * (a + b)
        tol = tolerance * jnp.abs(x) + 1e-12
        tol2 = 2.0 * tol

        # Try parabolic interpolation through (x, w, v).
        r = (x - w) * (fx - fv)
        q = (x - v) * (fx - fw)
        p = (x - v) * q - (x - w) * r
        q2 = 2.0 * (q - r)
        p = jnp.where(q2 > 0, -p, p)
        q2 = jnp.abs(q2)
        use_para = (
            (jnp.abs(p) < jnp.abs(0.5 * q2 * e))
            & (p > q2 * (a - x))
            & (p < q2 * (b - x))
        )
        e_para = d
        d_para = p / jnp.where(q2 == 0, 1.0, q2)
        # Golden-section step.
        e_gold = jnp.where(x < m, b - x, a - x)
        d_gold = GOLDEN * e_gold
        d_new = jnp.where(use_para, d_para, d_gold)
        e_new = jnp.where(use_para, e_para, e_gold)
        # Enforce minimum step.
        step = jnp.where(
            jnp.abs(d_new) >= tol, d_new, jnp.where(d_new > 0, tol, -tol)
        )
        u = x + step
        fu = f(u)

        improved = fu <= fx
        a_new = jnp.where(improved, jnp.where(u < x, a, x),
                          jnp.where(u < x, u, a))
        b_new = jnp.where(improved, jnp.where(u < x, x, b),
                          jnp.where(u < x, b, u))
        x_new = jnp.where(improved, u, x)
        fx_new = jnp.where(improved, fu, fx)
        # Bookkeeping for w, v.
        cond_w = improved | (fu <= fw) | (w == x)
        v_new = jnp.where(improved, w, jnp.where(cond_w, w, v))
        fv_new = jnp.where(improved, fw, jnp.where(cond_w, fw, fv))
        w_new = jnp.where(improved, x, jnp.where(cond_w, u, w))
        fw_new = jnp.where(improved, fx, jnp.where(cond_w, fu, fw))
        v_new = jnp.where(improved, w, v_new)
        return dict(a=a_new, b=b_new, x=x_new, w=w_new, v=v_new,
                    fx=fx_new, fw=fw_new, fv=fv_new, d=d_new, e=e_new)

    state = jax.lax.fori_loop(0, iterations, body, state)
    return state["x"]


def newton_maximize_batched(
    fdf: Callable[[jnp.ndarray], tuple],
    init: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    iterations: int = 25,
    epsilon: float = 1e-5,
) -> jnp.ndarray:
    """Safeguarded Newton-Raphson maximization in log space (reference
    Optimization::NewtonRaphson, src/optimization.hpp:331-402): fdf(y)
    returns (f'(y), f''(y)) of the log-likelihood wrt log branch length."""
    y = jnp.clip(init, lo, hi)

    def body(_, y):
        g, h = fdf(y)
        step = g / jnp.where(jnp.abs(h) > 1e-30, -h, -1e-30)
        # If the Hessian is not negative (not locally concave), fall back to
        # a gradient step.
        step = jnp.where(h < 0, step, jnp.sign(g) * 0.1)
        step = jnp.clip(step, -1.0, 1.0)
        return jnp.clip(y + step, lo, hi)

    return jax.lax.fori_loop(0, iterations, body, y)
