"""gpar_at_scale_tpu — a TPU-native probabilistic inference engine for
GPAR-style multi-output Gaussian-process models.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
Julia repo TudorParas/GPAR-at-scale (see SURVEY.md): exact, DTC/pseudo-point,
and Kalman/LGSSM state-space likelihoods for chained conditional GPs, plus
gradient-based type-II ML, NUTS/HMC, collapsed VI and SMC over kernel
hyperparameters, sharded over TPU meshes via pjit.
"""

__version__ = "0.1.0"
