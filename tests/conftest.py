"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's "fake TPU" strategy: tests never require TPU hardware;
multi-chip sharding is validated on forced host devices. The environment's
sitecustomize pre-imports jax with the axon TPU backend, so forcing the env
var alone is not enough — we update the config directly (backends initialize
lazily, so this sticks as long as no computation ran yet).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The suite is compile-dominated (CLAUDE.md); persist CPU executables so
# reruns skip recompiles. Separate dir from the TPU cache to avoid mixing
# backends.
from dfvo_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu")
)
