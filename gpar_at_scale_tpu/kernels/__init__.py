from gpar_at_scale_tpu.kernels.base import (
    Kernel,
    Sum,
    Product,
    ScaledKernel,
    SelectDims,
    LinearMapKernel,
    sq_dist,
)
from gpar_at_scale_tpu.kernels.stationary import (
    EQ,
    Matern12,
    Matern32,
    Matern52,
    RQ,
    scaled,
)
from gpar_at_scale_tpu.kernels.gpar import gpar_kernel, time_kernel_only

__all__ = [
    "Kernel",
    "Sum",
    "Product",
    "ScaledKernel",
    "SelectDims",
    "LinearMapKernel",
    "sq_dist",
    "EQ",
    "Matern12",
    "Matern32",
    "Matern52",
    "RQ",
    "scaled",
    "gpar_kernel",
    "time_kernel_only",
]
