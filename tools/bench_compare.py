"""Compare two BENCH_DETAIL-style per-query timing dicts.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio_threshold]

Prints the common-set total ratio and every query whose NEW/OLD ratio
exceeds the threshold (default 1.5), plus queries only in one file.
Remember the measured 2-4x hypervisor variance (CLAUDE.md): treat
ratios as pointers to investigate at low load, not verdicts.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d)
    return {k: float(v) for k, v in q.items()}


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    t_old = sum(old[k] for k in common)
    t_new = sum(new[k] for k in common)
    print(
        f"common set: {len(common)} queries, "
        f"{t_old:.1f}s -> {t_new:.1f}s ({t_new / max(t_old, 1e-9):.2f}x)"
    )
    for k in sorted(common, key=lambda k: new[k] / max(old[k], 1e-9),
                    reverse=True):
        r = new[k] / max(old[k], 1e-9)
        if r >= thresh and new[k] - old[k] > 0.25:
            print(f"  REGRESS {k}: {old[k]:.2f}s -> {new[k]:.2f}s ({r:.2f}x)")
    for k in sorted(common, key=lambda k: new[k] / max(old[k], 1e-9)):
        r = new[k] / max(old[k], 1e-9)
        if r <= 1 / thresh and old[k] - new[k] > 0.25:
            print(f"  improve {k}: {old[k]:.2f}s -> {new[k]:.2f}s ({r:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        t = sum(new[k] for k in only_new)
        print(f"new-only: {len(only_new)} queries, {t:.1f}s "
              f"({', '.join(only_new)})")
    only_old = sorted(set(old) - set(new))
    if only_old:
        print(f"dropped: {', '.join(only_old)}")


if __name__ == "__main__":
    main()
