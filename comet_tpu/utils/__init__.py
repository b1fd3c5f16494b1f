"""Utilities: profiling/tracing and logging helpers."""

from comet_tpu.utils.profiling import profile_trace, Timer, timed

__all__ = ["profile_trace", "Timer", "timed"]
