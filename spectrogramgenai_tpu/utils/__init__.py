from spectrogramgenai_tpu.utils.benchtools import device_sync, timeit_device

__all__ = ["device_sync", "timeit_device"]
