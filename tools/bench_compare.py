#!/usr/bin/env python3
"""Compare two bench artifacts per query.

Usage: bench_compare.py <old.json> <new.json> [ratio_threshold]

Prints shared-subset totals, the ratio, and every query whose new time
exceeds threshold x its old floor (default 2.0), plus queries present
only in one artifact. This is the adjudication tool VERDICT r9 #1 asks
for: run the bench in a quiet session, then reconcile against the prior
floor with numbers, not vibes.
"""
import json, sys

old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

shared = [k for k in new if k in old
          and isinstance(old[k], (int, float)) and isinstance(new[k], (int, float))]
so, sn = sum(old[k] for k in shared), sum(new[k] for k in shared)
ratio = f"{sn/so:.3f}x" if so > 0 else "n/a"
print(f"shared {len(shared)} queries: old={so:.1f}s new={sn:.1f}s ratio={ratio}")
only_new = [k for k in new if k not in old]
if only_new:
    print(f"new-only ({len(only_new)}): " + ", ".join(
        f"{k}={new[k]:.2f}" for k in sorted(only_new, key=lambda k: -new[k])))
regressed = sorted((k for k in shared if new[k] > thr * old[k] and new[k] > 0.3),
                   key=lambda k: -(new[k] / old[k]))
print(f"regressed >{thr}x (and >0.3s): {len(regressed)}")
for k in regressed:
    print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f}  ({new[k]/old[k]:.1f}x)")
improved = sorted((k for k in shared if old[k] > thr * new[k] and old[k] > 0.3),
                  key=lambda k: -(old[k] / new[k]))
print(f"improved >{thr}x (and was >0.3s): {len(improved)}")
for k in improved:
    print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f}  ({old[k]/new[k]:.1f}x)")
