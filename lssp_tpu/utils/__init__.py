"""Timers, logging, and observability (reference src/utils.cxx)."""

from lssp_tpu.utils.log import set_verbosity, get_verbosity, log, Timer

__all__ = ["set_verbosity", "get_verbosity", "log", "Timer"]
