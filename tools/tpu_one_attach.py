"""One-attach TPU session: health check -> SSSC device trace -> compaction
probe A/B.  Everything runs in ONE process so a single healthy attach
window is fully used: the axon tunnel wedges on rapid reattach AND on
killed attaches (see CLAUDE.md / NEXT.md #6), so when it recovers after an
outage, burning the window on three separate attaches is wasteful and
risky.  Chain the pending measurements instead.

Run from the repo root:  timeout 1500 python tools/tpu_one_attach.py
"""
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    print(f"devices: {jax.devices()}", flush=True)
    x = jnp.ones((256, 256))
    print(f"health matmul: {float((x @ x).sum()):.0f} "
          f"({time.time()-t0:.1f}s incl. first readback)", flush=True)

    # ---- 1) SSSC device trace (profile_epoch MODEL=sssc in-process)
    os.environ["MODEL"] = "sssc"
    import profile_epoch

    logdir = "/tmp/evo_trace_sssc_live"
    print("== SSSC trace ==", flush=True)
    profile_epoch.run_epochs(logdir)
    profile_epoch.parse(logdir)

    # ---- 2) compaction probe A/B
    print("== compaction probe ==", flush=True)
    import compact_slab_probe

    compact_slab_probe.measure()


if __name__ == "__main__":
    main()
