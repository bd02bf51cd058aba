"""Test configuration: force an 8-virtual-device CPU JAX backend.

Distributed/sharding tests run on a simulated 8-device mesh
(xla_force_host_platform_device_count) so the suite is hardware-independent;
the real-TPU path is exercised by bench.py / __graft_entry__.py instead.

The environment may pin JAX to an accelerator plugin via sitecustomize
(JAX_PLATFORMS is re-set at interpreter startup), so the env var alone is
not enough — jax.config is updated explicitly before backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"
