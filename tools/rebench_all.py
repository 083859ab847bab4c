#!/usr/bin/env python
"""Run every BASELINE.json config through bench.py and print the
round-final per-config table (VERDICT round-4 item 2: measurements, not
projections). Each row is a separate bench.py invocation so the JSON
line, selftest gates and fallback behavior are exactly what the driver
runs.

Run on the live chip:  python tools/rebench_all.py [--quick]
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (label, bench.py args) — 512x512 @128spp per-config rows (BASELINE.md
# round-3/5 tables) plus the official 1080p @16spp headline.
CONFIGS = [
    ("fractal 512x512 @128spp", ["--config", "fractal", "--res", "512",
                                 "--spp", "128"]),
    ("1080p @16spp headline", ["--config", "fractal"]),
    ("no-volume 512x512", ["--config", "no-volume"]),
    ("spheres 512x512", ["--config", "spheres"]),
    ("animated (camera) 512x512", ["--config", "animated"]),
    ("animated-geo (orbiting lights) 512x512", ["--config", "animated-geo"]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-seconds", type=float, default=60.0)
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter on config labels")
    args = ap.parse_args()

    results = []
    for label, extra in CONFIGS:
        if args.only and args.only not in label:
            continue
        cmd = [sys.executable, os.path.join(ROOT, "bench.py"),
               "--max-seconds", str(args.max_seconds)] + extra
        print(f"=== {label}: {' '.join(cmd[1:])}", flush=True)
        out = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=ROOT)
        line = None
        for ln in out.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{") and '"metric"' in ln:
                line = json.loads(ln)
        if line is None:
            print(f"  FAILED:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}",
                  flush=True)
            results.append((label, None))
            continue
        print(f"  {line['value']:.4f} {line['unit']} "
              f"(vs_baseline {line['vs_baseline']:.1f}x)", flush=True)
        results.append((label, line))

    print("\n| Config | Ms/s | vs 1-core CPU |")
    print("|---|---|---|")
    for label, line in results:
        if line is None:
            print(f"| {label} | FAILED | — |")
        else:
            print(f"| {label} | {line['value']:.4f} | "
                  f"{line['vs_baseline']:.1f}x |")


if __name__ == "__main__":
    main()
