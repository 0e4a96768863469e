from show_and_tell_tpu.obs.meters import StepTimer, ThroughputMeter  # noqa: F401
from show_and_tell_tpu.obs.profiler import profile_trace  # noqa: F401
