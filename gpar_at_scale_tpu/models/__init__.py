from gpar_at_scale_tpu.models.gpar import (
    FittedConditional,
    FittedGP,
    FittedGPAR,
    GPARConfig,
    fit_conditional,
    fit_first_output,
    fit_gpar,
)
