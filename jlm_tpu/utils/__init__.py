"""Observability utilities (SURVEY.md §7: tracing/metrics/logging)."""

from jlm_tpu.utils.logging import JsonlLogger, timed_span  # noqa: F401
from jlm_tpu.utils.profiling import device_timer, trace  # noqa: F401
