from g4s_tpu.obs.timings import Timings  # noqa: F401
from g4s_tpu.obs.profile import roofline, trace, detect_platform, PEAKS  # noqa: F401
