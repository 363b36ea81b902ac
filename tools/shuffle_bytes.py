"""Run one registry query and report wall time + shuffle volume.

Usage: python tools/shuffle_bytes.py <query> [sf_dir]

Drives the query through __spark_entry__.queries() to a noop sink,
then sums shuffle write bytes across stages from the Spark UI REST
API — the feedback loop for shuffle-volume work (VERDICT r7 #4).
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from ncagg_spark.session import get_spark

    spark = get_spark(
        app_name=f"shuffle-{name}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry.queries()[name]

    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    write_b = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    read_b = sum(s.get("shuffleReadBytes", 0) for s in stages)
    shuffles = [
        {
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:60],
            "writeMB": round(s["shuffleWriteBytes"] / 1e6, 2),
            "rows": s.get("shuffleWriteRecords", 0),
        }
        for s in sorted(
            stages, key=lambda s: -s.get("shuffleWriteBytes", 0)
        )
        if s.get("shuffleWriteBytes", 0) > 0
    ]
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "wall_sec": round(wall, 2),
                "shuffle_write_mb": round(write_b / 1e6, 2),
                "shuffle_read_mb": round(read_b / 1e6, 2),
                "stages": shuffles,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
