"""Observability utilities: structured step logs, phase timers, NaN guards."""

from gmpnp_tpu.utils.logging import StepLogger
from gmpnp_tpu.utils.profiling import PhaseTimer, trace_profile

__all__ = ["StepLogger", "PhaseTimer", "trace_profile"]
