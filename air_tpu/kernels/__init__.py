from air_tpu.kernels.st_pallas import (
    pallas_attention_read, pallas_attention_write, pallas_available,
)
from air_tpu.kernels.st_fused import fused_write_accumulate

__all__ = ["pallas_attention_read", "pallas_attention_write",
           "pallas_available", "fused_write_accumulate"]
