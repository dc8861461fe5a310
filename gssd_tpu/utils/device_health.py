"""Device-health probe for the tunneled TPU worker.

The remote axon worker occasionally enters a degraded state or a full
outage (any program hangs — even a tiny matmul) for ~20-40 minutes and
then self-recovers (STATUS r2 incidents). Launching a big eval
executable into an outage wedges the whole run, so the trainers probe
with a small timeout-bounded matmul before each eval block and simply
wait the outage out.

No reference analog (the reference assumes healthy local CUDA devices);
this is §5.3-style failure handling for the tunnel environment.
"""

from __future__ import annotations

import threading
import time


def _probe_once(timeout_s: float) -> bool:
    """Dispatch a tiny matmul and D2H it in a daemon thread; True iff it
    completes within timeout_s. A hung probe thread is abandoned (it
    finishes harmlessly if the worker recovers later)."""
    import jax.numpy as jnp

    done = threading.Event()

    def run():
        try:
            x = jnp.ones((128, 128))
            float((x @ x).sum())  # D2H sync (block_until_ready is a
            # no-op over the tunnel)
            done.set()
        except Exception:
            pass  # leave done unset -> treated as unhealthy

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return done.wait(timeout_s)


def wait_for_healthy_device(
    probe_timeout_s: float = 120.0,
    retry_wait_s: float = 120.0,
    max_wait_s: float = 3600.0,
    log=print,
) -> bool:
    """Block until a probe matmul completes. Returns True when healthy;
    False if max_wait_s elapsed without a successful probe."""
    start = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        if _probe_once(probe_timeout_s):
            if attempt > 1:
                log(f"device probe: recovered after "
                    f"{time.monotonic() - start:.0f}s")
            return True
        waited = time.monotonic() - start
        if waited >= max_wait_s:
            log(f"device probe: still unhealthy after {waited:.0f}s; "
                "giving up the wait")
            return False
        log(f"device probe: no response in {probe_timeout_s:.0f}s "
            f"(attempt {attempt}); waiting out a worker outage "
            f"({waited:.0f}s elapsed)")
        time.sleep(retry_wait_s)
