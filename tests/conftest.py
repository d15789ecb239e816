"""Test harness configuration.

Forces JAX onto an 8-device virtual CPU mesh so multi-chip sharding
(pjit / shard_map over a Mesh) is exercised in every test run without TPU
hardware, and numerical golden tests against OpenCV / scipy are bit-stable.

Note: the environment's sitecustomize registers an ``axon`` TPU backend and
force-sets ``jax_platforms="axon,cpu"`` — we override it back to cpu here,
before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the 4K detector/preproc compiles are tens of
# seconds on this 1-core host and identical across test sessions.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
