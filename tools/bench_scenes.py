"""Per-scene wall-clock benchmark at the reference's own configurations.

Runs the reference's headline scene configs (BASELINE.md) end-to-end on
the default device and prints wall time + primary rays/s next to the
reference's published laptop numbers.  Compile time is excluded (a small
warm-up render compiles each program; the persistent cache makes repeat
runs cheap).

Each scene runs in its OWN subprocess: the tunnel TPU intermittently
faults, and a JAX client that has seen a device error cannot recover, so
in-process retries would cascade.

Usage: python tools/bench_scenes.py [--quick]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (scene module, width, spp, depth, reference wall seconds or None, note)
CONFIGS = [
    ("cornell_box", 600, 200, 50, 60.0, "with redirection (test/Main.hs:386)"),
    ("demo1", 1200, 500, 50, 480.0, "README.md:23 ~8 min"),
    ("demo2", 400, 250, 4, 65.0, "test/Main.hs:385-388"),
    ("bunny_test", 600, 100, 10, None, "no published number"),
    ("pawn_test", 600, 100, 10, None, "no published number"),
]

CHILD = r"""
import json, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", {cache!r})
import jax.numpy as jnp
sys.path.insert(0, {repo!r}); sys.path.insert(0, {scenes!r})
import argparse
from raytrace_tpu.render.render import render_accumulate
mod = __import__({mod!r})
args = argparse.Namespace(width={width}, spp={spp}, depth={depth}, seed=1)
scene, settings, seed = mod.build(args)
n_pix = settings.image_width * settings.image_height
# Warm up with the SAME program shape as the timed run (an spp-4 warmup
# compiles a different rotate_k/chunk program, so the timed first full-spp
# call would pay compile-cache deserialization — measured +7 s on demo2).
acc, _ = render_accumulate(scene, settings, seed=0, spp={spp})
_ = float(acc[0, 0])
t0 = time.time()
acc, _ = render_accumulate(scene, settings, seed=1, spp={spp})
# end the timed region by FETCHING a value — block_until_ready can return
# before execution on the tunnel (CLAUDE.md)
_ = float(acc[0, 0])
dt = time.time() - t0
from raytrace_tpu.utils.engines import engine_report
print("RESULT " + json.dumps(dict(wall_s=dt, rays_per_s=n_pix * {spp} / dt,
                                  engines=engine_report(scene, settings))))
"""


def run_child(mod_name, width, spp, depth, attempts=3):
    code = CHILD.format(cache=os.path.join(REPO, ".jax_cache"), repo=REPO,
                        scenes=os.path.join(REPO, "scenes"), mod=mod_name,
                        width=width, spp=spp, depth=depth)
    for attempt in range(attempts):
        try:
            out = subprocess.run([sys.executable, "-c", code], timeout=560,
                                 capture_output=True, text=True)
            for line in out.stdout.splitlines():
                if line.startswith("RESULT "):
                    return json.loads(line[7:])
            print(f"  {mod_name}: no result (rc={out.returncode}); "
                  f"stderr tail: {out.stderr.strip().splitlines()[-1:]}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"  {mod_name}: timeout", file=sys.stderr, flush=True)
        time.sleep(5)
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="quarter-spp versions (for smoke runs)")
    p.add_argument("--only", default=None,
                   help="comma-separated scene names to run")
    cli = p.parse_args()
    only = set(cli.only.split(",")) if cli.only else None

    results = {}
    for mod_name, width, spp, depth, ref_s, note in CONFIGS:
        if only is not None and mod_name not in only:
            continue
        spp_eff = max(spp // 4, 4) if cli.quick else spp
        r = run_child(mod_name, width, spp_eff, depth)
        if r is None:
            print(f"{mod_name:12s} FAILED", flush=True)
            continue
        dt = r["wall_s"] * (spp / spp_eff)
        rays_s = r["rays_per_s"]
        speedup = (ref_s / dt) if ref_s else None
        results[mod_name] = dict(
            wall_s=round(dt, 2), rays_per_s=round(rays_s, 1),
            reference_wall_s=ref_s,
            speedup=round(speedup, 1) if speedup else None)
        sp = f"{speedup:7.1f}x" if speedup else "      --"
        print(f"{mod_name:12s} {width:5d}px {spp:4d}spp d{depth:<3d} "
              f"{dt:8.2f}s  {rays_s/1e6:8.2f}M rays/s  vs ref {sp}  ({note})",
              flush=True)

    print(json.dumps({"metric": "scene_wall_clock_vs_reference",
                      "results": results}))


if __name__ == "__main__":
    main()
