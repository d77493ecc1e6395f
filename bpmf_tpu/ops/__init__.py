"""Compute ops: Normal-Wishart sampling, the batched conditional update,
and (bpmf_tpu.ops.pallas_update) the fused Pallas hot kernel."""

from bpmf_tpu.ops.mvnormal import (  # noqa: F401
    HyperParams,
    cond_normal_wishart,
    normal_wishart,
    sample_hyper,
    wishart_chol,
    wishart_unit_chol,
)
from bpmf_tpu.ops.update import (  # noqa: F401
    BucketDev,
    chol_solve_sample,
    gram_rhs,
    sample_bucket,
)
