"""Run every pending TPU measurement, each in its own subprocess (a JAX
client that has seen a tunnel fault cannot recover in-process —
CLAUDE.md), skipping forward when the chip is unavailable.

Usage: python tools/run_pending_tpu.py [names...]
Default order: probe, completion, bench, bigmesh, roofline.
Logs to stdout; per-step timeout keeps one hung step from eating the
session.
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = {
    "probe": ("python -c \"import jax.numpy as jnp; "
              "print('probe ok', (jnp.arange(8.0)*3).sum())\"", 180),
    "completion": ("python tools/prof_completion.py", 3600),
    "bench": ("python bench.py", 1800),
    "bigmesh": ("python tools/bench_bigmesh.py", 1800),
    "roofline": ("python tools/roofline.py", 1800),
}


def main():
    names = sys.argv[1:] or ["probe", "completion", "bench", "bigmesh",
                             "roofline"]
    for name in names:
        cmd, tmo = STEPS[name]
        print(f"==== {name} ({cmd}) ====", flush=True)
        t0 = time.time()
        try:
            p = subprocess.run(cmd, shell=True, cwd=REPO, timeout=tmo,
                               capture_output=True, text=True)
            out = "\n".join(l for l in (p.stdout + p.stderr).splitlines()
                            if "WARNING" not in l)
            print(out[-4000:], flush=True)
            print(f"---- {name}: rc={p.returncode} "
                  f"{time.time()-t0:.0f}s ----", flush=True)
            if name == "probe" and p.returncode != 0:
                print("chip unavailable; aborting", flush=True)
                return 1
        except subprocess.TimeoutExpired:
            print(f"---- {name}: TIMEOUT after {tmo}s ----", flush=True)
            if name == "probe":
                print("chip unavailable; aborting", flush=True)
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
