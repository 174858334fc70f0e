"""Relay/TPU health diagnostic: stage-by-stage probe with timeouts.

The axon relay can degrade (permanent ~30-65 ms dispatch floor after
the first D2H read — see docs/PERF_ANALYSIS.md) or wedge outright
(2026-08-20 outage: blocking calls park forever). Each stage here runs
in its OWN subprocess with a hard timeout, so a wedged relay yields a
diagnosis instead of a hung terminal:

    python scripts/relay_health.py [timeout_s]

Prints one JSON line: per-stage ms or "timeout"/"error". Healthy clean
session: dispatch ~1-5000 ms (first-compile), chain ~0.1-2 ms/op,
read ~1-60 ms.
"""
import json
import os
import subprocess
import sys

STAGES = {
    "dispatch": (
        "import time,jax,jax.numpy as jnp;"
        "t=time.perf_counter();"
        "jax.block_until_ready(jnp.sum(jnp.arange(1024.0)));"
        "print((time.perf_counter()-t)*1e3)"
    ),
    "upload": (
        "import time,jax,numpy as np;"
        "x=np.zeros((16384,4),np.float32);"
        "t=time.perf_counter();jax.block_until_ready(jax.device_put(x));"
        "print((time.perf_counter()-t)*1e3)"
    ),
    "chain16": (
        "import time,jax,jax.numpy as jnp;"
        "f=jax.jit(lambda x:x*1.0000001+1.0);x=jnp.zeros(128);"
        "jax.block_until_ready(f(x));"
        "t=time.perf_counter()\n"
        "for _ in range(16): x=f(x)\n"
        "jax.block_until_ready(x);print((time.perf_counter()-t)*1e3/16)"
    ),
    "read": (
        "import time,jax,jax.numpy as jnp,numpy as np;"
        "y=jnp.sum(jnp.arange(1024.0));jax.block_until_ready(y);"
        "t=time.perf_counter();np.asarray(y);"
        "print((time.perf_counter()-t)*1e3)"
    ),
    "read_after_taint": (
        # second read in the SAME session: prices the tainted floor
        "import time,jax,jax.numpy as jnp,numpy as np;"
        "y=jnp.sum(jnp.arange(1024.0));np.asarray(y);"
        "z=jnp.sum(jnp.arange(2048.0));jax.block_until_ready(z);"
        "t=time.perf_counter();np.asarray(z);"
        "print((time.perf_counter()-t)*1e3)"
    ),
}


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    out = {}
    for name, code in STAGES.items():
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=budget,
            )
            if r.returncode == 0 and r.stdout.strip():
                out[name] = round(float(r.stdout.strip().splitlines()[-1]), 2)
            else:
                tail = (r.stderr or "").strip().splitlines()[-1:]
                out[name] = f"error: {' '.join(tail)[:120]}"
        except subprocess.TimeoutExpired:
            out[name] = f"timeout>{budget:.0f}s"
    vals = [v for v in out.values() if isinstance(v, float)]
    out["verdict"] = (
        "wedged" if not vals else
        "degraded" if any(isinstance(v, str) for v in out.values())
        or (isinstance(out.get("chain16"), float) and out["chain16"] > 10)
        else "healthy"
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
