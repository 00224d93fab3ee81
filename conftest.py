"""Pytest env setup — must run before jax is imported anywhere.

- Forces the CPU platform with 8 fake devices so `shard_map`/psum paths
  unit-test on one host (SURVEY.md §4.4).
- Unsets PALLAS_AXON_POOL_IPS: the axon sitecustomize hook otherwise
  claims the real TPU at interpreter start for every test run (and can
  hang while the tunnel resets).  NOTE: this works because pytest's
  conftest import happens before any test module imports jax; the
  sitecustomize TPU claim already happened at interpreter start, but
  JAX_PLATFORMS=cpu below keeps jax itself off the axon backend.
"""
import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize may set jax's platform config directly during
# its register() call at interpreter start, which overrides the env var
# above.  Backends initialize lazily, so re-forcing the config here
# (before any test module touches a device) restores the CPU platform.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
