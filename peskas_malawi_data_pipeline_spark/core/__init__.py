from .session import get_spark, stop_spark
from .config import load_config
from . import io

__all__ = ["get_spark", "stop_spark", "load_config", "io"]
