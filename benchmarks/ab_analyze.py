"""Summarize results/ab_r4/*.json (the queued round-4 TPU A/Bs) as a
sorted table: name, eigensolves/s, iters/k, compile_s, residual/err.

    python benchmarks/ab_analyze.py [results/ab_r4]
"""

import glob
import json
import os
import sys


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "results/ab_r4"
    rows = []
    for f in sorted(glob.glob(os.path.join(d, "*.json"))):
        name = os.path.splitext(os.path.basename(f))[0]
        try:
            with open(f) as fh:
                line = fh.read().strip().splitlines()[-1]
            r = json.loads(line)
        except Exception as e:
            rows.append((name, None, f"unreadable: {e}"))
            continue
        det = r.get("detail", {})
        rows.append((name, r.get("value"), dict(
            iters=det.get("mean_lobpcg_iters"),
            compile_s=det.get("compile_s"),
            err=det.get("max_rel_eig_err_vs_analytic"),
            res=det.get("max_residual"),
            mode=det.get("mode"),
            pc_mode=det.get("pc_mode"),
            tflops=det.get("achieved_tflops"),
        )))
    rows.sort(key=lambda t: -(t[1] or 0.0))
    for name, val, info in rows:
        v = f"{val:7.3f}" if isinstance(val, (int, float)) else "   FAIL"
        print(f"{name:20s} {v} eig/s  {info}")


if __name__ == "__main__":
    main()
