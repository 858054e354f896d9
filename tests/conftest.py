"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-device tests exercise DP sharding / psum reductions / sharded rerank
without TPUs (SURVEY.md section 4 implication (d)).  Must set env before the
first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend in every process regardless
# of JAX_PLATFORMS in the environment; force the CPU backend explicitly so the
# virtual 8-device mesh is what tests run on.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")
