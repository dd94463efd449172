from air_tpu.models.config import AIRConfig
from air_tpu.models.air import AIRModel, AIROutputs, air_forward, init_air_params

__all__ = ["AIRConfig", "AIRModel", "AIROutputs", "air_forward",
           "init_air_params"]
