"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; all sharding logic is exercised
on ``--xla_force_host_platform_device_count=8`` per SURVEY.md §6.4.  This
must run before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers the TPU plugin at interpreter boot and
# pins jax_platforms=axon via config, which overrides the env var — force
# CPU through the config API as well.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from jlm_tpu.config import Config
from jlm_tpu.data import (
    Lexicon,
    build_vocab,
    encode_corpus,
    generate_corpus,
    generate_test_set,
    split_corpus,
)
from jlm_tpu.models.params import init_params


TINY = Config(
    vocab_size=256,
    embed_size=32,
    hidden_size=64,
    num_layers=1,
    beam_width=4,
    max_kana_len=30,
    max_nodes_per_frame=16,
    max_lookahead=48,
    batch_size=4,
    num_steps=8,
    seed=42,
)


@pytest.fixture(scope="session")
def tiny_config() -> Config:
    return TINY


@pytest.fixture(scope="session")
def corpus_lines():
    return generate_corpus(n_sentences=800, seed=1234)


@pytest.fixture(scope="session")
def vocab(corpus_lines, tiny_config):
    return build_vocab(corpus_lines, tiny_config.vocab_size)


@pytest.fixture(scope="session")
def lexicon(vocab):
    return Lexicon.from_vocab(vocab)


@pytest.fixture(scope="session")
def encoded(corpus_lines, vocab):
    ids = encode_corpus(corpus_lines, vocab)
    return split_corpus(ids)


@pytest.fixture(scope="session")
def tiny_params(tiny_config):
    return init_params(tiny_config)


@pytest.fixture(scope="session")
def test_sentences():
    return generate_test_set(n_sentences=12, seed=777)
