from air_tpu.data.mnist import load_mnist, synthesize_mnist, get_mnist
from air_tpu.data.multi_mnist import (
    generate_multi_image,
    generate_dataset,
    MultiMNISTConfig,
)
from air_tpu.data.records import write_records, read_records
from air_tpu.data.loader import TrainLoader, load_test_data

__all__ = [
    "load_mnist", "synthesize_mnist", "get_mnist",
    "generate_multi_image", "generate_dataset", "MultiMNISTConfig",
    "write_records", "read_records",
    "TrainLoader", "load_test_data",
]
