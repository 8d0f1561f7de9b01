import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharded-loss/parallel tests are
# deterministic without TPU hardware (SURVEY.md §4 implication).
#
# The environment's sitecustomize registers the TPU ("axon") backend at
# interpreter startup, so env vars alone are too late — use jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
