from air_tpu.utils.profiling import (
    StepTimer, trace_annotation, start_profiler_trace, stop_profiler_trace,
)

__all__ = ["StepTimer", "trace_annotation", "start_profiler_trace",
           "stop_profiler_trace"]
