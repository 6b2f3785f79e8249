"""close_kmers_tpu: TPU-native signature-kmer annotation framework.

``CLOSE_KMERS_JAX_PLATFORM`` (e.g. ``cpu``) selects the JAX platform for
CLI subprocesses.  The plain ``JAX_PLATFORMS`` env var is not enough in
environments whose interpreter startup (sitecustomize) registers and
pins an accelerator plugin before user code runs; ``jax.config.update``
still wins as long as no computation has executed yet, so we apply it at
package import.
"""

import os as _os

_plat = _os.environ.get("CLOSE_KMERS_JAX_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)
