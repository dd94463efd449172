from air_tpu.utils.profiling import (
    StepTimer, trace_annotation, start_profiler_trace, stop_profiler_trace,
    profile_trace, compiled_cost_analysis,
)
from air_tpu.utils.tb_writer import EventWriter

__all__ = ["StepTimer", "trace_annotation", "start_profiler_trace",
           "stop_profiler_trace", "profile_trace", "compiled_cost_analysis",
           "EventWriter"]
