from buckgnn_tpu.models.buckgnn import BuckGNN  # noqa: F401
