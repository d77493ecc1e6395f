from bpmf_tpu.models.bpmf import (  # noqa: F401
    EvalData,
    EvalState,
    Metrics,
    SideData,
    SideState,
    gibbs_iter,
    half_sweep,
    init_side_state,
    predict,
)
