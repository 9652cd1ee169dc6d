"""Training harness: jit'd train steps, epoch loop, checkpoint/resume."""

from vibo_tpu.train.trainer import TrainConfig, Trainer  # noqa: F401
from vibo_tpu.train.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
