"""Full-registry single-rep timing sweep (OPTIMIZATION_r13 triage).

Times EVERY registered query once (after one untimed warmup run) with
the noop sink at the given SF dir and prints a sorted name->seconds
JSON. Not a benchmark protocol — a triage map to find the expensive
operators outside the headline set. Use bench.py for comparable
numbers.

Usage: python scripts/allbench.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from net7_etl_bus_spark.plans import registry  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/allbench.json"
    spark = get_spark("allbench")
    qs = registry.queries()
    times: dict[str, float] = {}
    for i, (name, fn) in enumerate(qs.items()):
        try:
            spark.sparkContext.setJobDescription(f"allbench: {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times[name] = round(time.perf_counter() - t0, 3)
            print(f"[{i + 1}/{len(qs)}] {name}: {times[name]:.3f}s (warm {warm:.3f})",
                  file=sys.stderr)
        except Exception:
            times[name] = -1.0
            print(f"[{i + 1}/{len(qs)}] {name}: ERROR", file=sys.stderr)
            traceback.print_exc()
    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "times": ranked}, f, indent=1)
    print(json.dumps(ranked))
    spark.stop()


if __name__ == "__main__":
    main()
