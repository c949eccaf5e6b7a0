"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without real multi-chip hardware (SURVEY.md §4 implications: the
reference never had distributed tests; we validate meshes on a virtual
8-device CPU topology)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# The environment may force a TPU platform plugin via sitecustomize (jax is
# then already imported before this file runs and the env var alone is too
# late) — override post-import so tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# NOTE: no persistent compilation cache here — the environment routes
# compiles through a remote service whose AOT output targets different CPU
# features than this host (cpu_aot_loader warns about possible SIGILL).
