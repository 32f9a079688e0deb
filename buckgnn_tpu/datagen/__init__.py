"""Data generation (L1): organic shapes -> meshes -> loadcases ->
solver runs. Host-side, NumPy-only; see shapes.py, loadcases.py,
runner.py."""

from buckgnn_tpu.datagen.loadcases import (  # noqa: F401
    Loadcase,
    LoadcaseConfig,
    LoadcaseType,
    generate_loadcase,
    generate_model_cases,
)
from buckgnn_tpu.datagen.runner import RunnerConfig, SolverRunner  # noqa: F401
from buckgnn_tpu.datagen.shapes import (  # noqa: F401
    ShapeConfig,
    generate_shape_mesh,
)
