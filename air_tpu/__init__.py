"""air_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Attend-Infer-Repeat framework.

Re-implements, TPU-first, every capability of the reference TF1 research repo
(`aakhundov/tf-attend-infer-repeat`): the AIR model with Concrete/Gumbel-Softmax
relaxation of z_pres and ACT-style cumulative stopping, the multi-MNIST dataset
generator, the training driver, real-time inference serving, and the
TensorBoard-projector embedding tool.

Design stance (see SURVEY.md §7):
  * The reference's dynamic ``tf.while_loop`` + ``TensorArray`` recurrence
    (reference air/air_model.py:544-566) becomes a static ``jax.lax.scan``
    over ``max_steps`` with stop masks carried in the loop state.
  * The spatial transformer's bilinear gather (reference air/transformer.py)
    becomes separable interpolation *matmuls* on the MXU, with an optional
    fused Pallas kernel and a general gather fallback.
  * Data parallelism is expressed with ``jax.sharding.Mesh`` + NamedSharding
    (XLA inserts the ICI all-reduce), not translated NCCL calls.
"""

from air_tpu.models.config import AIRConfig
from air_tpu.models.air import AIRModel, AIROutputs, air_forward, init_air_params

__version__ = "0.1.0"

__all__ = [
    "AIRConfig",
    "AIRModel",
    "AIROutputs",
    "air_forward",
    "init_air_params",
]
