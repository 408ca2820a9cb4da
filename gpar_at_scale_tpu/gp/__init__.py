from gpar_at_scale_tpu.gp.exact import (
    GPPosterior,
    condition,
    log_marginal_likelihood,
    nlml,
)
from gpar_at_scale_tpu.gp.dtc import (
    QU,
    compute_q_u,
    dtc_objective,
    dtc_objective_iid,
    predict_scaled,
    predict_sparse_iid,
    titsias_elbo,
)
