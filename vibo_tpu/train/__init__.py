"""Training harness: jit'd train steps, epoch loop, checkpoint/resume."""

from vibo_tpu.train.trainer import TrainConfig, Trainer  # noqa: F401
from vibo_tpu.train.checkpoint import (  # noqa: F401
    save_checkpoint, load_checkpoint, transplant_params,
    load_params_self_describing)
