"""The GPAR additive kernel.

The reference builds, for output i with inputs ``(t, y_1..y_{i-1})``::

    k((t,y), (t',y')) = s_t * k_time(t/l_t, t'/l_t) + s_o * k_out(y/l_o, y'/l_o)

via 0/1 ``stretch`` masks (``src/gp/optimized.jl:132-144``,
``src/util.jl:102-123``).  Here the masks are static column selections — the
time block sees column 0, the output block sees columns 1..D-1 — composed with
the family constructors.  The result is a plain pytree kernel usable by every
likelihood backend (exact / DTC / state-space).
"""

from __future__ import annotations

from gpar_at_scale_tpu.kernels.base import Sum


def gpar_kernel(
    time_family,
    out_family,
    input_dim: int,
    time_l,
    time_sigma,
    out_l,
    out_sigma,
):
    """Additive masked GPAR kernel over (time, prev-output) features.

    ``time_family`` / ``out_family`` are stationary kernel classes (e.g.
    ``EQ``, ``Matern52``).  Variances follow reference semantics s = sigma^2.
    """
    if input_dim < 2:
        raise ValueError("gpar_kernel needs >= 2 input dims (time + >=1 output)")
    time_k = time_family(lengthscale=time_l, variance=time_sigma**2).select((0,))
    out_k = out_family(lengthscale=out_l, variance=out_sigma**2).select(
        tuple(range(1, input_dim))
    )
    return Sum(left=time_k, right=out_k)


def time_kernel_only(time_family, time_l, time_sigma):
    """First output of the chain: a plain scaled kernel on time
    (``src/gp/optimized.jl:117-127`` multi_input=false branch)."""
    return time_family(lengthscale=time_l, variance=time_sigma**2)
