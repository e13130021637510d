"""Import-time JAX configuration (reference ``africanus/util/jax_init.py``).

The reference enables 64-bit mode on import for its jax proof-of-concept.
Here the rule is backend-aware: TPU backends have no float64, so x64 is
only enabled when running on CPU (where the complex/f64 wrapper APIs
live). Import this module before first JAX use.
"""

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)

del jax
