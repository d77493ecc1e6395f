from bpmf_tpu.utils.counters import Counters, tick  # noqa: F401
