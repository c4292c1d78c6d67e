from .mesh import (DATA_AXIS, MODEL_AXIS, build_mesh, data_sharded,
                   host_cpu_mesh, model_sharded_cols, model_sharded_rows,
                   replicated, single_device_mesh, use_mesh)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "build_mesh", "data_sharded", "host_cpu_mesh",
    "model_sharded_cols", "model_sharded_rows", "replicated",
    "single_device_mesh", "use_mesh",
]
