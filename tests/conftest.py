"""Test configuration: run everything on CPU with 8 virtual devices so the
data-parallel mesh paths are exercised without TPU hardware (SURVEY.md §4).

Note: this environment's 'axon' TPU plugin overrides the JAX_PLATFORMS env
var, so the config API must be used instead.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

# persistent XLA cache: the suite is compile-dominated (~30 s/test for the
# jitted render/train graphs), so repeat runs drop well under the 5-minute
# budget once the cache is warm
from laenerf_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
