"""Training: optax optimizers with submodule masks, jitted train steps,
orbax checkpointing with last/bestAP/bestAR semantics, weight surgery."""

from apse_uav_tpu.train.optim import build_finetune_optimizer, param_labels  # noqa: F401
from apse_uav_tpu.train.steps import detector_train_step, association_train_step  # noqa: F401
