"""Print the operator registry as a category table with reference
citations — the quick index for auditing COVERAGE.md against code.

Usage: python tools/coverage_report.py [category]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from opengxt_ray import registry  # noqa: E402


def main() -> int:
    want = sys.argv[1] if len(sys.argv) > 1 else None
    cats = registry.by_category()
    total = 0
    for cat in sorted(cats):
        if want and cat != want:
            continue
        print(f"\n## {cat} ({len(cats[cat])})")
        for name in cats[cat]:
            e = registry.get(name)
            fn = e.build
            loc = f"{fn.__module__.replace('opengxt_ray.', '')}.{fn.__name__}" \
                if hasattr(fn, "__module__") else "?"
            ref = f"  [{e.reference}]" if e.reference else ""
            print(f"  {name:34s} {loc}{ref}")
        total += len(cats[cat])
    print(f"\n{total} processes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
