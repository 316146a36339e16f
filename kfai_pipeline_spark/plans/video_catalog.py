"""Video-catalog API: the reference's ``get_video_db_data`` re-expressed
as one DataFrame plan (J1 + J2 + A1; ref
/root/reference/src/kfai/extractors/utils/helpers/database.py:134-184).

SQL shape reproduced:
    SELECT vv.id, vv.video_id, ss.name AS show_name,
           GROUP_CONCAT(hh.name) AS hosts
    FROM videos_video vv
    JOIN shows_show ss          ON vv.show_id = ss.id
    LEFT JOIN videos_video_hosts vvh ON vv.id = vvh.video_id
    LEFT JOIN hosts_host hh     ON vvh.host_id = hh.id
    [WHERE vv.video_id IN (...)]
    GROUP BY vv.id

Differences by design: hosts stay ``ARRAY<STRING>`` (the reference
flattens to CSV then re-splits — SURVEY §1.2 flags that as lossy) and
the array is sorted for determinism (GROUP_CONCAT order is undefined).
Dims broadcast: shows/hosts are small; the only shuffle is the
bridge-join groupBy on the video id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def video_catalog(
    videos: DataFrame,
    shows: DataFrame,
    video_hosts: DataFrame,
    hosts: DataFrame,
    video_ids: list[str] | None = None,
) -> DataFrame:
    """(id, video_id, show_name, hosts ARRAY<STRING>) — one row per
    video. ``video_ids`` applies the reference's IN-list re-fetch path
    (database.py:159-164, P3)."""
    vv = videos
    if video_ids:
        vv = vv.where(F.col("video_id").isin(*video_ids))
    joined = (
        vv.join(F.broadcast(shows), vv.show_id == shows.id)
        .select(
            vv.id.alias("vid_pk"),
            "video_id",
            shows.name.alias("show_name"),
        )
        .join(F.broadcast(video_hosts), F.col("vid_pk") == video_hosts.video_id, "left")
        .drop(video_hosts.video_id)
        .join(F.broadcast(hosts), video_hosts.host_id == hosts.id, "left")
    )
    return (
        joined.groupBy("vid_pk", "video_id", "show_name")
        .agg(
            F.array_sort(
                F.filter(F.collect_list(hosts.name), lambda h: h.isNotNull())
            ).alias("hosts")
        )
        .select(F.col("vid_pk").alias("id"), "video_id", "show_name", "hosts")
    )
