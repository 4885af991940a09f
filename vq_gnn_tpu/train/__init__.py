from vq_gnn_tpu.train.state import TrainState
from vq_gnn_tpu.train.step import StepFns, make_step_fns

__all__ = ["TrainState", "StepFns", "make_step_fns"]
