from gpar_at_scale_tpu.utils.params import (
    constrain,
    unconstrain,
    unpack_gp,
    unpack_gpar,
    unpack_gpar6,
    pack_gp,
    pack_gpar,
    pack_gpar6,
    init_gp_params,
    init_gpar_params,
    init_gpar_params6,
)
from gpar_at_scale_tpu.utils.psd import add_jitter, cholesky_psd, solve_lower, solve_upper

__all__ = [
    "constrain",
    "unconstrain",
    "unpack_gp",
    "unpack_gpar",
    "unpack_gpar6",
    "pack_gp",
    "pack_gpar",
    "pack_gpar6",
    "init_gp_params",
    "init_gpar_params",
    "init_gpar_params6",
    "add_jitter",
    "cholesky_psd",
    "solve_lower",
    "solve_upper",
]

from gpar_at_scale_tpu.utils.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from gpar_at_scale_tpu.utils.observability import (
    MetricsLogger,
    profiler_trace,
    stage_timer,
    throughput,
)

__all__ += [
    "latest_step",
    "restore_checkpoint",
    "save_checkpoint",
    "MetricsLogger",
    "profiler_trace",
    "stage_timer",
    "throughput",
]

from gpar_at_scale_tpu.utils.resilience import run_with_checkpointing

__all__ += ["run_with_checkpointing"]
