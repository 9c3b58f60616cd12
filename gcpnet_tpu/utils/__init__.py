from gcpnet_tpu.utils.pylogger import get_pylogger

__all__ = ["get_pylogger"]
