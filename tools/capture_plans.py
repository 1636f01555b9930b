"""Capture .explain("formatted") for every headline bench query into
plans/r{N}/<name>_<tag>.txt (tag = before/after; N from
$PLANS_ROUND, default 15). Plan capture only —
no timed execution (construction-side jobs like localCheckpoint still
run, as they do in the bench).

Usage: python tools/capture_plans.py <tag> [query ...]
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from big_ann_spark.queries import load_all  # noqa: E402
from big_ann_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r" + os.environ.get("PLANS_ROUND", "15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    registry = load_all()
    spark = get_spark("capture-plans")
    for name in names:
        q = registry.get(name)
        if q is None:
            print(f"skip {name}: not registered")
            continue
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        df = q.fn(spark, sf_dir)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        n_exchange = txt.count("Exchange")
        n_py = sum(
            txt.count(k)
            for k in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas")
        )
        print(
            f"{name}: {len(txt.splitlines())} lines, "
            f"{n_exchange} Exchange, {n_py} python-boundary -> {path}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
