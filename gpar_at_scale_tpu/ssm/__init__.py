from gpar_at_scale_tpu.ssm.markov import LGSSM, SDE, discretize, lgssm_of, to_sde
from gpar_at_scale_tpu.ssm.kalman import (
    decorrelate,
    kalman_filter,
    log_det_cov,
    logpdf,
    posterior_sample,
    rts_smooth,
)
from gpar_at_scale_tpu.ssm.pkalman import (
    parallel_decorrelate,
    parallel_filter,
    parallel_logpdf,
    parallel_smooth,
)
from gpar_at_scale_tpu.ssm.blocked import (
    blocked_decorrelate,
    blocked_filter,
    blocked_logpdf,
    blocked_posterior_sample,
    blocked_smooth,
    blocked_suffix_scan,
    ffbs_draw,
)
from gpar_at_scale_tpu.ssm.blocked_grad import blocked_loglik
from gpar_at_scale_tpu.ssm.segmented import (
    segmented_decorrelate,
    segmented_filter,
    segmented_logpdf,
    segmented_posterior_sample,
    segmented_smooth,
)
