"""Test configuration: force an 8-device CPU JAX runtime with float64.

SURVEY.md §7 [ENV]: in this environment `XLA_FLAGS=--xla_force_host_platform_
device_count` and the `JAX_PLATFORMS` env var do NOT take effect (the shell
pins an experimental TPU relay plugin), so the working recipe is the
in-process config update below, which must run before JAX initializes its
backends — hence it lives at conftest import time, ahead of any test import
of jax-using modules.

CPU × 8 fake devices exercises the shard_map/ppermute distribution layer
(T9/T10/T16) without a TPU pod; Pallas kernels run in interpreter mode on
CPU (their compiled path is exercised by scripts/tpu_smoke.py on the real
chip).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
