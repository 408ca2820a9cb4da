"""Gradient-based type-II maximum likelihood.

Replaces the reference's derivative-free Nelder-Mead
(``Optim.optimize(nlml, x0, NelderMead(), ...)``, ``src/gp/optimized.jl:45,164``,
``src/gp/dtc.jl:58-61``) with jit-compiled L-BFGS / Adam driven by
``jax.value_and_grad``.  The reference imported Zygote but never called
``gradient`` (SURVEY.md §2b) — the derivative-free choice was an artifact, and
gradients are strictly better on TPU: the whole optimization loop is one
``lax.while_loop`` under jit, no host round-trips per step.

The objective is always over an unconstrained log-parameter vector (see
``gpar_at_scale_tpu/utils/params.py`` for the positivity transform).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class OptResult(NamedTuple):
    params: jnp.ndarray  # optimized unconstrained parameters
    value: jnp.ndarray  # final objective value
    num_steps: jnp.ndarray  # steps actually taken
    converged: jnp.ndarray  # grad-norm tolerance reached


def minimize_lbfgs(
    fun: Callable,
    x0,
    *,
    max_steps: int = 200,
    gtol: float = 1e-6,
    memory_size: int = 10,
) -> OptResult:
    """Minimize ``fun`` with L-BFGS + zoom line search, fully under jit.

    The loop is a ``lax.while_loop`` (compiler-friendly: no data-dependent
    Python control flow), so one compile serves any number of steps.
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=30),
    )
    value_and_grad = optax.value_and_grad_from_state(fun)

    def cond(carry):
        x, state, step = carry
        grad = optax.tree.get(state, "grad")
        gnorm = optax.global_norm(grad)
        return jnp.logical_and(step < max_steps, gnorm > gtol)

    def body(carry):
        x, state, step = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(grad, state, x, value=value, grad=grad, value_fn=fun)
        x = optax.apply_updates(x, updates)
        return x, state, step + 1

    x0 = jnp.asarray(x0)
    state0 = opt.init(x0)
    # Seed value/grad so the first cond() sees a real gradient.
    v0, g0 = jax.value_and_grad(fun)(x0)
    state0 = optax.tree.set(state0, value=v0, grad=g0)

    x, state, steps = jax.lax.while_loop(cond, body, (x0, state0, jnp.asarray(0)))
    value = optax.tree.get(state, "value")
    grad = optax.tree.get(state, "grad")
    return OptResult(
        params=x,
        value=value,
        num_steps=steps,
        converged=optax.global_norm(grad) <= gtol,
    )


def minimize_adam(
    fun: Callable,
    x0,
    *,
    learning_rate: float = 5e-2,
    max_steps: int = 500,
    gtol: float = 1e-6,
) -> OptResult:
    """Adam fallback for objectives where L-BFGS line search struggles
    (e.g. stochastic or very ill-conditioned surfaces)."""
    opt = optax.adam(learning_rate)
    vg = jax.value_and_grad(fun)

    def cond(carry):
        x, state, step, value, gnorm = carry
        return jnp.logical_and(step < max_steps, gnorm > gtol)

    def body(carry):
        x, state, step, _, _ = carry
        value, grad = vg(x)
        updates, state = opt.update(grad, state, x)
        x = optax.apply_updates(x, updates)
        return x, state, step + 1, value, optax.global_norm(grad)

    x0 = jnp.asarray(x0)
    carry = (x0, opt.init(x0), jnp.asarray(0), jnp.asarray(jnp.inf, x0.dtype), jnp.asarray(jnp.inf, x0.dtype))
    x, state, steps, value, gnorm = jax.lax.while_loop(cond, body, carry)
    return OptResult(params=x, value=value, num_steps=steps, converged=gnorm <= gtol)


def multi_start(
    fun: Callable,
    x0s: jnp.ndarray,
    *,
    method: str = "lbfgs",
    **kwargs,
) -> OptResult:
    """vmap the optimizer over a batch of initializations (axis 0 of x0s) and
    return the best run — the TPU answer to NLML multi-modality (the reference
    relied on a single random init, ``src/util.jl:128-134``)."""
    minimize = minimize_lbfgs if method == "lbfgs" else minimize_adam
    results = jax.vmap(lambda x0: minimize(fun, x0, **kwargs))(x0s)
    best = jnp.nanargmin(results.value)
    return OptResult(
        params=results.params[best],
        value=results.value[best],
        num_steps=results.num_steps[best],
        converged=results.converged[best],
    )
