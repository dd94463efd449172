from air_tpu.serve.model_wrapper import ModelWrapper

__all__ = ["ModelWrapper"]
