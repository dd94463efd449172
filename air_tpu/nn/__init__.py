from air_tpu.nn.layers import dense_init, dense_apply, mlp_init, mlp_apply
from air_tpu.nn.lstm import lstm_init, lstm_apply, lstm_zero_state
from air_tpu.nn.vae import vae_init, vae_apply
from air_tpu.nn.cnn import cnn_init, cnn_apply

__all__ = [
    "dense_init", "dense_apply", "mlp_init", "mlp_apply",
    "lstm_init", "lstm_apply", "lstm_zero_state",
    "vae_init", "vae_apply",
    "cnn_init", "cnn_apply",
]
