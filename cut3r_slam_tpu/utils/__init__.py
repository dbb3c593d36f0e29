from .config import load_config, load_calib, DEFAULT_CONFIG  # noqa: F401
from .image import mono_stream  # noqa: F401
