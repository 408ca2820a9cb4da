from gpar_at_scale_tpu.inference.optimize import (
    OptResult,
    minimize_adam,
    minimize_lbfgs,
    multi_start,
)
from gpar_at_scale_tpu.inference.diagnostics import (
    Diagnostics,
    ess,
    means_agree_within_mc_error,
    split_rhat,
    summarize,
)
from gpar_at_scale_tpu.inference.hmc import effective_sample_size, hmc
from gpar_at_scale_tpu.inference.nuts import nuts
from gpar_at_scale_tpu.inference.smc import smc
from gpar_at_scale_tpu.inference.vi import fit_sparse_vi, predict_sparse_vi
