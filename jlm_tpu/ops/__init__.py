"""Pallas TPU kernels and low-level ops — the build's native layer.

The reference contains zero native code; its numpy inference engine is the
stand-in for native kernels (SURVEY.md §3.2).  Here those hot paths become
Pallas TPU kernels: the fused LSTM cell + time-block scan, and the
output-projection kernel with in-kernel int8 dequant + online logsumexp +
candidate-logit extraction.
"""
