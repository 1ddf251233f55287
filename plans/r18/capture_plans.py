"""Capture `.explain("formatted")` for a list of catalog entries into
plans/r17/<name>_<tag>.txt (tag = before/after). Run from a checkout of
the code revision you want to fingerprint:

    PYTHONPATH=<checkout> python plans/r17/capture_plans.py after q1 q2 ...

Entries whose builders eagerly materialize intermediates execute those
builds; the captured text is the final plan the bench times.
"""
from __future__ import annotations

import os
import sys

OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sys.path.insert(0, os.environ.get("VSS_CAPTURE_REPO", os.path.dirname(os.path.dirname(OUT_DIR))))
    from vector_search_spark.queries import get_catalog
    from vector_search_spark.session import get_spark

    spark = get_spark(app_name=f"plan-capture-{tag}")
    cat = get_catalog()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = cat[name].fn(spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print("wrote", name, tag)


if __name__ == "__main__":
    main()
