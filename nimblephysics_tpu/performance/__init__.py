"""Performance instrumentation (reference: dart/performance)."""

from nimblephysics_tpu.performance.perf_log import PerformanceLog, trace
