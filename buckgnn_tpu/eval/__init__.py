from buckgnn_tpu.eval.inference import run_inference  # noqa: F401
from buckgnn_tpu.eval.timer import run_time_analysis  # noqa: F401
