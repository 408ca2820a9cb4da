"""Hyperparameter packing / positivity transforms.

Reference semantics (``src/util.jl:36-55``): hyperparameters are optimized in
log space and mapped to the positive reals with ``exp(p) + 1e-3``.  We keep
the identical transform so optimum log-parameters are directly comparable
with the reference, but ours is differentiable end-to-end (the reference used
derivative-free Nelder-Mead; see SURVEY.md §2b "Optim" row).

GP parameter vector (3,):    [log_l, log_process_sigma, log_noise_sigma]
GPAR parameter vector (5,):  [log_time_l, log_time_sigma, log_out_l,
                              log_out_sigma, log_noise_sigma]

As in the reference, the *signal variance* handed to the kernel is
``process_sigma**2`` and the observation noise variance is ``noise_sigma**2``
(``src/gp/optimized.jl:30-34``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SHIFT = 1e-3


def constrain(log_p):
    """Map unconstrained log-parameter to positive value: exp(p) + 1e-3."""
    return jnp.exp(log_p) + _SHIFT


def unconstrain(p):
    """Inverse of :func:`constrain` (requires p > 1e-3).

    Checked eagerly for concrete inputs: p <= 1e-3 has no preimage under
    exp(.) + 1e-3 and would otherwise silently produce NaN parameters.
    """
    p = jnp.asarray(p)
    if not isinstance(p, jax.core.Tracer) and bool(jnp.any(p <= _SHIFT)):
        raise ValueError(
            f"unconstrain: parameter value {p} must be > {_SHIFT} "
            "(the positivity transform is exp(x) + 1e-3)"
        )
    return jnp.log(p - _SHIFT)


def unpack_gp(params):
    """(3,) log-params -> (lengthscale, process_sigma, noise_sigma).

    Mirrors ``unpack_gp`` at ``src/util.jl:36-43``.
    """
    return constrain(params[0]), constrain(params[1]), constrain(params[2])


def unpack_gpar(params):
    """(5,) log-params -> (time_l, time_sigma, out_l, out_sigma, noise_sigma).

    Mirrors ``unpack_gpar`` at ``src/util.jl:45-55``.
    """
    return (
        constrain(params[0]),
        constrain(params[1]),
        constrain(params[2]),
        constrain(params[3]),
        constrain(params[4]),
    )


def unpack_gpar6(params):
    """(6,) log-params -> (time_l, time_sigma, out_l, out_sigma,
    noise_sigma, time_noise_sigma).

    The separate-noise variant finishing reference defect K4: the reference
    shares ONE sigma between the temporal GP's observation noise and the
    f/u FiniteGPs' output noise ("Temporal noise and output noise are the
    same", ``src/gp/dtc.jl:18``; "TODO: look into having different noise
    values", ``src/gp/gpar_scaled_inference.jl:60``).  Here the first five
    entries keep the reference pack's order/meaning (``noise_sigma`` = the
    output noise carried by the u FiniteGP, i.e. the K_uu ridge,
    ``src/gp/dtc.jl:35``) and the sixth is the separately-learned temporal
    observation noise (the LGSSM's R)."""
    return tuple(constrain(params[i]) for i in range(6))


def pack_gpar6(time_l, time_sigma, out_l, out_sigma, noise_sigma, time_noise_sigma):
    return jnp.stack(
        [
            unconstrain(jnp.asarray(v))
            for v in (time_l, time_sigma, out_l, out_sigma, noise_sigma, time_noise_sigma)
        ]
    )


def pack_gp(l, process_sigma, noise_sigma):
    return jnp.stack(
        [unconstrain(jnp.asarray(l)), unconstrain(jnp.asarray(process_sigma)),
         unconstrain(jnp.asarray(noise_sigma))]
    )


def pack_gpar(time_l, time_sigma, out_l, out_sigma, noise_sigma):
    return jnp.stack(
        [
            unconstrain(jnp.asarray(time_l)),
            unconstrain(jnp.asarray(time_sigma)),
            unconstrain(jnp.asarray(out_l)),
            unconstrain(jnp.asarray(out_sigma)),
            unconstrain(jnp.asarray(noise_sigma)),
        ]
    )


def _init(key, given, n):
    """Random U(0,1) init for unspecified log-params (``src/util.jl:128-134``)."""
    rand = jax.random.uniform(key, (n,))
    if given is None:
        return rand
    given = [g for g in given]
    out = []
    for i, g in enumerate(given):
        out.append(rand[i] if g is None else jnp.asarray(g, dtype=rand.dtype))
    return jnp.stack(out)


def init_gp_params(key, i_log_l=None, i_log_process_sigma=None, i_log_noise_sigma=None):
    """Initial (3,) log-param vector; mirrors ``parse_initial_gp_params``
    (``src/util.jl:141-147``) but with explicit PRNG-key discipline."""
    return _init(key, [i_log_l, i_log_process_sigma, i_log_noise_sigma], 3)


def init_gpar_params(
    key,
    i_log_time_l=None,
    i_log_time_sigma=None,
    i_log_out_l=None,
    i_log_out_sigma=None,
    i_log_noise_sigma=None,
):
    """Initial (5,) log-param vector; mirrors ``parse_initial_gpar_params``
    (``src/util.jl:154-169``)."""
    return _init(
        key,
        [i_log_time_l, i_log_time_sigma, i_log_out_l, i_log_out_sigma, i_log_noise_sigma],
        5,
    )


def init_gpar_params6(
    key,
    i_log_time_l=None,
    i_log_time_sigma=None,
    i_log_out_l=None,
    i_log_out_sigma=None,
    i_log_noise_sigma=None,
    i_log_time_noise_sigma=None,
):
    """Initial (6,) log-param vector for the separate-noise pack."""
    return _init(
        key,
        [
            i_log_time_l,
            i_log_time_sigma,
            i_log_out_l,
            i_log_out_sigma,
            i_log_noise_sigma,
            i_log_time_noise_sigma,
        ],
        6,
    )
