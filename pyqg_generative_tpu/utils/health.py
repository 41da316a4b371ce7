"""Backend health probe for long campaign chains.

The axon TPU runtime here can wedge after a worker kernel fault: not only
does the faulting client die (JaxRuntimeError UNAVAILABLE — handled by the
campaigns' subprocess isolation), the *pool grant itself* can disappear, in
which case every subsequent process hangs forever inside backend
initialization (``jax.devices()`` never returns). A chain that launches its
next stage into that state burns its whole timeout budget hanging.

``backend_alive()`` probes in a **subprocess** (initialization hangs cannot
be cancelled in-process) with a hard timeout; ``wait_for_backend()`` polls
until the backend answers or a deadline passes, so chains can skip or delay
cleanly instead of hanging. No reference counterpart (SLURM re-queues
around dead nodes; here the probe is the equivalent).
"""
from __future__ import annotations

import subprocess
import sys
import time

_PROBE = (
    # the container's sitecustomize pins JAX_PLATFORMS at interpreter
    # startup, so a platform override must go through jax.config, not env
    "import os\n"
    "import jax\n"
    "p = os.environ.get('PYQG_PROBE_PLATFORM')\n"
    "if p: jax.config.update('jax_platforms', p)\n"
    "jax.devices()\n"
    "import jax.numpy as jnp\n"
    "assert float(jnp.ones((4, 4)).sum()) == 16.0\n"
    "print('BACKEND_OK')\n"
)


def backend_alive(timeout: float = 90.0, platform: str | None = None) -> bool:
    """True iff a fresh process can initialize the backend and run one
    computation within `timeout` seconds. `platform` overrides
    JAX_PLATFORMS for the probe (default: inherit the environment)."""
    import os
    env = dict(os.environ)
    if platform is not None:
        env["PYQG_PROBE_PLATFORM"] = platform
    try:
        out = subprocess.run([sys.executable, "-c", _PROBE],
                             capture_output=True, text=True,
                             timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        return False
    return out.returncode == 0 and "BACKEND_OK" in out.stdout


def wait_for_backend(deadline_s: float = 600.0, probe_timeout: float = 90.0,
                     interval_s: float = 60.0,
                     platform: str | None = None) -> bool:
    """Poll `backend_alive` until it succeeds or `deadline_s` elapses.
    Returns True on success; callers (campaign chains) should skip the
    stage on False rather than launch into a hung initialization."""
    t0 = time.monotonic()
    while True:
        if backend_alive(probe_timeout, platform):
            return True
        if time.monotonic() - t0 >= deadline_s:
            return False
        time.sleep(interval_s)
