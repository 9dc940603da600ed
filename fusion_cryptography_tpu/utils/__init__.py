"""Utilities: profiling/tracing hooks and structured logging.

The reference has no in-library observability (SURVEY.md §5: wall-clock +
memory_profiler in the benchmark harness only); these are the TPU-native
equivalents."""
from .profiling import op_timer, trace
from .log import get_logger
