"""Gated real-TPU parity smoke.

The suite pins JAX to the virtual CPU mesh (conftest), so the real-chip
run happens in a subprocess with a clean environment.  Opt in with
CLOSE_KMERS_TPU_SMOKE=1 (the chip may be busy / absent in CI)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("CLOSE_KMERS_TPU_SMOKE") != "1",
                    reason="set CLOSE_KMERS_TPU_SMOKE=1 to run on the "
                           "real chip")
def test_tpu_parity_smoke():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_smoke.py")],
        capture_output=True, text=True, timeout=1800, env=env)
    sys.stderr.write(p.stderr)
    sys.stdout.write(p.stdout)
    assert p.returncode == 0, p.stdout + p.stderr
