from air_tpu.ops.transformer import (
    transformer,
    batch_transformer,
    separable_transform,
    attention_read,
    attention_write,
)
from air_tpu.ops.concrete import (
    concrete_binary_sample,
    concrete_binary_pre_sigmoid_sample,
    concrete_binary_kl_mc_sample,
)
from air_tpu.ops.gaussian import sample_from_mvn, gaussian_kl
from air_tpu.ops.schedules import exponential_decay, annealed_value

__all__ = [
    "transformer",
    "batch_transformer",
    "separable_transform",
    "attention_read",
    "attention_write",
    "concrete_binary_sample",
    "concrete_binary_pre_sigmoid_sample",
    "concrete_binary_kl_mc_sample",
    "sample_from_mvn",
    "gaussian_kl",
    "exponential_decay",
    "annealed_value",
]
