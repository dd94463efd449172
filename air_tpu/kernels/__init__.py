from air_tpu.kernels.st_pallas import (
    pallas_attention_read, pallas_attention_write, pallas_available,
)

__all__ = ["pallas_attention_read", "pallas_attention_write",
           "pallas_available"]
