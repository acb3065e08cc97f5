"""Timers, logging, and observability (reference src/utils.cxx)."""

from lssp_tpu.utils.log import (set_verbosity, get_verbosity, log,
                                warning, set_log, Timer)
from lssp_tpu.utils.memory import host_memory_mb, device_memory_mb
from lssp_tpu.utils.checkpoint import (
    save_checkpoint, load_checkpoint, checkpointed_solve)
from lssp_tpu.utils import profile
from lssp_tpu.utils.debug import nan_guard, check_finite

__all__ = ["set_verbosity", "get_verbosity", "log", "warning",
           "set_log", "Timer",
           "host_memory_mb", "device_memory_mb",
           "save_checkpoint", "load_checkpoint", "checkpointed_solve",
           "profile", "nan_guard", "check_finite"]
