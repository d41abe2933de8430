"""Sweep BLOCK/LANES/skin/cadence on the TPU via subprocess bench runs."""
import os
import subprocess
import sys

CONFIGS = [
    # (BLOCK, LANES, SKIN, CADENCE)
    (128, 256, 0.2, 40),
    (128, 512, 0.2, 40),
    (192, 256, 0.2, 40),
    (256, 256, 0.2, 40),
    (128, 256, 0.3, 100),
    (128, 512, 0.3, 100),
]


def main():
    for blk, lanes, skin, cad in CONFIGS:
        env = dict(os.environ)
        env.update(MOLLYTPU_BLOCK=str(blk), MOLLYTPU_LANES=str(lanes),
                   MOLLYTPU_BENCH_SKIN=str(skin),
                   MOLLYTPU_BENCH_CADENCE=str(cad))
        r = subprocess.run([sys.executable, "bench.py"], env=env,
                           capture_output=True, text=True, timeout=1500)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(f"B={blk} L={lanes} skin={skin} cad={cad}:",
              line[-1] if line else "FAILED: " + r.stderr.splitlines()[-1]
              if r.stderr else "no output",
              flush=True)


if __name__ == "__main__":
    main()
