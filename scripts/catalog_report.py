"""Generate CATALOG.md: the full query inventory with module, tags,
oracle status, and cumulative driver evidence — the judge/navigation
index over the full query catalog.

    python scripts/catalog_report.py > CATALOG.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from knowledgebot_spark.registry import driver_green, load

    catalog = load()
    green = driver_green()
    print("# CATALOG — query inventory")
    print()
    print(f"{len(catalog)} queries; {sum(1 for q in catalog.values() if q.sql)} "
          f"with DuckDB oracles; {len(green)} with cumulative driver hash-green "
          "evidence (CORRECTNESS_r*.json).  Order below is the driver's "
          "evidence-rotation order: never-checked queries first, then checked "
          "queries by the round they were LAST hash-green (stalest first) — "
          "the first 50 rows are the next round's correctness window, so once "
          "coverage closed (r08) each window re-certifies the oldest evidence.")
    never = sum(1 for name in catalog if name not in green)
    if 0 < never <= 100:
        tail = max(0, never - 50)
        if tail == 0:
            print()
            print(f"All {never} remaining never-checked queries fit inside the "
                  "next round's 50-row window — driver coverage closes at "
                  f"{len(catalog)}/{len(catalog)} when it lands.")
        elif tail <= 50:
            print()
            print(f"After the next round's 50-row window lands, {tail} "
                  "never-checked queries remain (rows 51–"
                  f"{never} below) — they all fit inside the following "
                  "round's window, projecting full driver coverage at "
                  f"{len(catalog)}/{len(catalog)} two rounds out.")
    print()
    print("| # | query | module | tags | oracle | driver-green |")
    print("|---|---|---|---|---|---|")
    for i, (name, qd) in enumerate(catalog.items(), 1):
        mod = qd.fn.__module__.rsplit(".", 1)[-1].replace("queries_", "")
        tags = ", ".join(qd.tags)
        print(
            f"| {i} | {name} | {mod} | {tags} | "
            f"{'yes' if qd.sql else 'rows-only'} | "
            f"{'yes' if name in green else ''} |"
        )


if __name__ == "__main__":
    main()
