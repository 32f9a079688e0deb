from buckgnn_tpu.train.losses import get_loss_function  # noqa: F401
from buckgnn_tpu.train.metrics import MAPE_error, stress_errors  # noqa: F401
