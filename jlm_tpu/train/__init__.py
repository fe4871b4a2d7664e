"""Training layer: optax trainer, PPL eval, checkpointing (ref: JLM:train/)."""

from jlm_tpu.train.trainer import Trainer, train_lm  # noqa: F401
from jlm_tpu.train.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
