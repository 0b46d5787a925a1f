from g4s_tpu.obs.timings import Timings  # noqa: F401
