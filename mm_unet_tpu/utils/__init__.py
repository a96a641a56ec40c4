from mm_unet_tpu.utils.config import ConfigDict, load_config
from mm_unet_tpu.utils.logger import Logger
from mm_unet_tpu.utils.preempt import GracefulShutdown
from mm_unet_tpu.utils.seeding import same_seeds

__all__ = ["ConfigDict", "load_config", "GracefulShutdown", "Logger", "same_seeds"]
