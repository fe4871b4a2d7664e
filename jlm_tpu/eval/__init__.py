"""Evaluation harness (ref: JLM:decoder/ eval script — SURVEY.md §5.5)."""

from jlm_tpu.eval.conversion import evaluate_conversion, ConversionReport  # noqa: F401
