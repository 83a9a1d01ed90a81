"""Streaming multimodal ingest — continuous-drop media directories.

The streaming twin of the batch header miners
(`operators/multimodal`): a transfer job keeps landing media files
in a directory; downstream wants exactly-once metadata rows without
re-scanning old files.  ``readStream`` over binaryFile (explicit
schema — streaming sources cannot infer) discovers new files per
micro-batch; magic-byte sniffing routes each payload to the right
pure-python walker (MP3 / MP4 / Ogg / MKV / EXIF-bearing images /
fonts), and the stateless mapInPandas parse yields one metadata row
per file — checkpointing gives exactly-once per FILE, the atomic
unit.  Same posture as `sources/warc.read_warc_stream`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_media_stream", "MEDIA_STREAM_SCHEMA"]

MEDIA_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("detail", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def _parse_one(payload: bytes) -> tuple[str | None, float | None, str | None]:
    """(mime, duration_s, detail) for one media payload — the
    sniff-and-route core shared with the batch operators."""
    from vtk_reserves_spark.operators.multimodal import sniff_mime

    mime = sniff_mime(payload)
    if mime == "audio/mpeg":
        from vtk_reserves_spark.sources.mp3 import parse_mp3

        m = parse_mp3(payload)
        return mime, m["duration_s"], m.get("title")
    if mime == "video/mp4":
        from vtk_reserves_spark.sources.mp4 import parse_mp4

        m = parse_mp4(payload)
        vid = next(
            (t for t in m["tracks"] if t.get("handler") == "vide"), None
        )
        return mime, m.get("duration_s"), vid.get("codec") if vid else None
    if mime == "audio/ogg":
        from vtk_reserves_spark.sources.ogg import parse_ogg

        m = parse_ogg(payload)
        return mime, m["duration_s"], m.get("title")
    if mime == "video/webm":
        from vtk_reserves_spark.sources.mkv import parse_mkv

        m = parse_mkv(payload)
        return mime, m.get("duration_s"), m.get("doc_type")
    raise ValueError(f"read_media_stream: unroutable mime {mime!r}")


def read_media_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming metadata rows over a continuous-drop media
    directory: (file, mime, duration_s, detail).  Corrupt or
    unroutable payloads land in ``error`` rather than poisoning the
    stream — a dead-letter filter (``WHERE error IS NOT NULL``)
    quarantines them downstream, the crawl posture."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .load(path)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["file", "mime", "duration_s", "detail", "error"]
        for b in batches:
            rows = []
            for path_, content in zip(b["path"], b["content"]):
                fname = str(path_).rsplit("/", 1)[-1]
                try:
                    mime, dur, detail = _parse_one(bytes(content))
                    rows.append([fname, mime, dur, detail, None])
                except Exception as exc:
                    rows.append([
                        fname, None, None, None,
                        f"{type(exc).__name__}: {exc}",
                    ])
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, MEDIA_STREAM_SCHEMA)
