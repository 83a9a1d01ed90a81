"""Multimodal (image/audio/video) column plumbing.

North-star addition (SURVEY.md §2.8; the reference's closest analog is
its pixel-table ingest, ``_gui.py:1251-1264``).  Media ride as opaque
``binary`` payload columns with a typed metadata struct; decode /
feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` stages so payload bytes never pass through the driver
and partition boundaries are preserved.

Codec status (round 4): PNG, JPEG (baseline + progressive), GIF, BMP,
PNM/TGA/ICO, WebP — lossless VP8L AND lossy VP8 key frames with ALPH
alpha — WAV, FLAC, and MJPG/uncompressed AVI all decode FOR REAL via
the repo's pure-python codecs; ``sniff_mime`` recovers lying
Content-Types from magic bytes and ``decode_media`` auto-dispatches
on generic mimes.  H.264/VP9 video remains gated behind
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic byte-arithmetic fake whose outputs are reproducible
(and SQL-expressible for the oracle).  ``extract_features`` offers
``on_error='null'`` quarantine for corrupt crawl payloads.  The
Spark-side plumbing — schema, batch iteration, UDF signatures,
partitioning — is identical for every path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every payload
MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", modality: str = "image"
) -> DataFrame:
    """Wrap a column's bytes as an opaque media payload + metadata struct
    (stand-in for real image/audio bytes in the synthetic corpus)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(f"{modality}/x-fake").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_png_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a REAL PNG payload per row (pure-zlib encoder,
    `sources/image.py`): grayscale ``w = 8 + n%9``, ``h = 8 + n%7``
    (n = utf-8 byte count), pixel ``p`` = byte ``p % n`` (all-zero when
    the text is empty).  Deterministic, so the decoded geometry and
    pixel mean stay oracle-expressible while the payload bytes are a
    genuine compressed image format."""
    from vtk_reserves_spark.sources.image import encode_png

    @F.pandas_udf(T.BinaryType())
    def to_png(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            b = np.frombuffer((t or "").encode("utf-8"), np.uint8)
            n = b.size
            w, h = 8 + n % 9, 8 + n % 7
            img = b[np.arange(w * h) % n].reshape(h, w) if n else np.zeros((h, w), np.uint8)
            out.append(encode_png(img))
        return pd.Series(out)

    with_payload = df.select(F.col(id_col), to_png(F.col(text_col)).alias("payload"))
    return with_payload.select(
        id_col,
        "payload",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/png").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_progressive_jpeg_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a REAL progressive-JPEG payload per row
    (`sources/jpeg.py` encode_jpeg_progressive: SOF2, DC successive-
    approximation bit-planes, split AC bands with SA refinement,
    restart intervals): a flat grayscale ``w = 8 + n%5`` by
    ``h = 8 + n%7`` frame of uniform value ``2*((n*11) % 128)``
    (n = utf-8 byte count).  Flat even-valued frames are EXACT through
    JPEG quantization (the level-shifted DC is a multiple of the
    quantizer and every AC coefficient is zero), so the full
    progressive scan pipeline — Huffman decode, bit-plane
    accumulation, IDCT — runs for real while the oracle keeps a closed
    form."""
    from vtk_reserves_spark.sources.jpeg import encode_jpeg_progressive

    @F.pandas_udf(T.BinaryType())
    def to_pjpg(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            n = len((t or "").encode("utf-8"))
            w, h = 8 + n % 5, 8 + n % 7
            img = np.full((h, w), 2 * ((n * 11) % 128), np.uint8)
            out.append(
                encode_jpeg_progressive(img, restart_interval=2)
            )
        return pd.Series(out)

    with_payload = df.select(F.col(id_col), to_pjpg(F.col(text_col)).alias("payload"))
    return with_payload.select(
        id_col,
        "payload",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/jpeg").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_wav_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    sample_rate: int = 8000,
) -> DataFrame:
    """Synthesize a REAL WAV payload per row (pure-struct RIFF codec,
    `sources/wav.py`): mono 16-bit PCM with ``m = 64 + n % 64`` samples
    (n = utf-8 byte count), sample ``i = (byte[i % n] % 192 - 96) * 256``
    (all-zero when the text is empty).  ASCII straddles byte 96, so the
    waveform genuinely crosses zero, and the ``% 192`` keeps non-ASCII
    utf-8 bytes (>= 0xC0) inside int16 instead of silently wrapping —
    for pure-ASCII text (the oracle corpus) it is the identity.
    Deterministic and oracle-expressible while the payload is a genuine
    audio container."""
    from vtk_reserves_spark.sources.wav import encode_wav

    @F.pandas_udf(T.BinaryType())
    def to_wav(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            b = np.frombuffer((t or "").encode("utf-8"), np.uint8).astype(np.int64)
            n = b.size
            m = 64 + n % 64
            s = (
                (b[np.arange(m) % n] % 192 - 96) * 256
                if n
                else np.zeros(m, np.int64)
            )
            out.append(encode_wav(s.astype(np.int16), sample_rate))
        return pd.Series(out)

    with_payload = df.select(F.col(id_col), to_wav(F.col(text_col)).alias("payload"))
    return with_payload.select(
        id_col,
        "payload",
        F.struct(
            F.lit("audio").alias("modality"),
            F.lit("audio/wav").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_flac_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    sample_rate: int = 8000,
) -> DataFrame:
    """Synthesize a REAL FLAC payload per row (`sources/flac.py`): the
    SAME waveform rule as :func:`attach_wav_payload` (``m = 64 + n%64``
    mono 16-bit samples, ``s_i = (byte[i%n] % 192 - 96) * 256``) but
    compressed as genuine FLAC — blocksize 48 forces multiple frames
    per payload, and fixed-order-2 prediction makes the rice-coded
    residual path real.  FLAC is lossless, so the decoded features
    match the WAV oracle's closed form bit-for-bit."""
    from vtk_reserves_spark.sources.flac import encode_flac

    @F.pandas_udf(T.BinaryType())
    def to_flac(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            b = np.frombuffer((t or "").encode("utf-8"), np.uint8).astype(np.int64)
            n = b.size
            m = 64 + n % 64
            s = (
                (b[np.arange(m) % n] % 192 - 96) * 256
                if n
                else np.zeros(m, np.int64)
            )
            out.append(
                encode_flac(s, sample_rate, 16, blocksize=48,
                            subframe_mode="fixed2")
            )
        return pd.Series(out)

    with_payload = df.select(F.col(id_col), to_flac(F.col(text_col)).alias("payload"))
    return with_payload.select(
        id_col,
        "payload",
        F.struct(
            F.lit("audio").alias("modality"),
            F.lit("audio/flac").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio decode: parse each payload — RIFF/WAVE PCM
    (pure-struct codec) or FLAC (pure-python bitstream decoder,
    sniffed by the fLaC magic) — executor-side and reduce to the
    standard quick-look signal features — duration, RMS level,
    zero-crossing count (the classic cheap voicing/noisiness proxy),
    and absolute peak.  Arrow-batched ``mapInPandas``; bytes never
    leave the executor."""
    import numpy as np

    from vtk_reserves_spark.sources.flac import decode_flac
    from vtk_reserves_spark.sources.wav import decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"), pdf["payload"]):
                raw = bytes(p)
                if raw[:4] == b"fLaC":
                    s, rate, _bits = decode_flac(raw)
                else:
                    s, rate = decode_wav(raw)
                if s.ndim > 1:  # downmix by first channel for features
                    s = s[:, 0]
                v = s.astype(np.float64)
                m = len(s)
                nonneg = v >= 0
                rows.append(
                    (
                        did,
                        rate,
                        m,
                        m / rate,
                        float(np.sqrt(np.mean(v * v))) if m else 0.0,
                        int(np.count_nonzero(nonneg[1:] != nonneg[:-1])),
                        int(np.max(np.abs(s))) if m else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "duration_s",
                    "rms", "zero_crossings", "peak",
                ],
            )

    return df.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def attach_avi_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", fps: int = 10
) -> DataFrame:
    """Synthesize a REAL AVI payload per row (pure-struct RIFF codec,
    `sources/avi.py`): ``2 + n%4`` grayscale frames of ``w = 4 + n%5``
    by ``h = 4 + n%3`` (n = utf-8 byte count), frame ``f`` pixel ``p`` =
    byte ``(f*w*h + p) % n`` (zeros when empty) — deterministic and
    oracle-expressible while the payload is a genuine video container."""
    from vtk_reserves_spark.sources.avi import encode_avi

    @F.pandas_udf(T.BinaryType())
    def to_avi(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            b = np.frombuffer((t or "").encode("utf-8"), np.uint8)
            n = b.size
            nf, w, h = 2 + n % 4, 4 + n % 5, 4 + n % 3
            if n:
                frames = b[np.arange(nf * w * h) % n].reshape(nf, h, w)
            else:
                frames = np.zeros((nf, h, w), np.uint8)
            out.append(encode_avi(frames, fps))
        return pd.Series(out)

    with_payload = df.select(F.col(id_col), to_avi(F.col(text_col)).alias("payload"))
    return with_payload.select(
        id_col,
        "payload",
        F.struct(
            F.lit("video").alias("modality"),
            F.lit("video/x-msvideo").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_mjpg_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", fps: int = 10
) -> DataFrame:
    """Synthesize a REAL motion-JPEG AVI payload per row: ``2 + n%3``
    flat grayscale frames of ``w = 8 + n%5`` by ``h = 8 + n%7`` (n =
    utf-8 byte count), frame ``f`` uniformly ``2*((n*7 + f*13) % 128)``.

    The flat even-valued frames are EXACT through baseline JPEG: the
    level-shifted DC coefficient ``8*(v-128)`` is a multiple of the DC
    quantizer (16) whenever v is even and every AC coefficient is zero,
    so decode returns the byte-identical frame — which gives the oracle
    a closed form while the payload is a genuine compressed MJPG stream
    (`sources/jpeg.py` entropy coding, quantization and IDCT all run
    for real on the decode side)."""
    from vtk_reserves_spark.sources.avi import encode_avi

    @F.pandas_udf(T.BinaryType())
    def to_mjpg(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            n = len((t or "").encode("utf-8"))
            nf, w, h = 2 + n % 3, 8 + n % 5, 8 + n % 7
            frames = np.stack(
                [
                    np.full((h, w), 2 * ((n * 7 + f * 13) % 128), np.uint8)
                    for f in range(nf)
                ]
            )
            out.append(encode_avi(frames, fps, codec="MJPG"))
        return pd.Series(out)

    with_payload = df.select(F.col(id_col), to_mjpg(F.col(text_col)).alias("payload"))
    return with_payload.select(
        id_col,
        "payload",
        F.struct(
            F.lit("video").alias("modality"),
            F.lit("video/x-msvideo").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)


def video_frames(df: DataFrame) -> DataFrame:
    """REAL video decode: parse each AVI container (pure-struct RIFF
    codec), extract every frame's actual pixel grid, and emit one row
    per frame with its geometry and pixel mean — the real-decode upgrade
    of :func:`frame_sample`'s byte-stride plumbing.  Arrow-batched
    ``mapInPandas``; container bytes never leave the executor."""
    from vtk_reserves_spark.sources.avi import decode_avi

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"), pdf["payload"]):
                frames, _fps, _spans = decode_avi(bytes(p))
                nf, h, w = frames.shape
                for i in range(nf):
                    rows.append((did, i, w, h, float(frames[i].mean())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "width", "height", "mean_px"]
            )

    return df.mapInPandas(run, VIDEO_FRAME_SCHEMA)


def gif_frames(df: DataFrame) -> DataFrame:
    """REAL animated-GIF decode (pure-python LZW, `sources/gif.py`):
    composite every frame onto the logical screen and emit one row per
    frame with its geometry and pixel mean — the GIF twin of
    :func:`video_frames`.  Arrow-batched ``mapInPandas``; container
    bytes never leave the executor."""
    from vtk_reserves_spark.sources.gif import decode_gif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"), pdf["payload"]):
                frames, _delays, _loop = decode_gif(bytes(p))
                nf, h, w, _ = frames.shape
                for i in range(nf):
                    rows.append((did, i, w, h, float(frames[i].mean())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "width", "height", "mean_px"]
            )

    return df.mapInPandas(run, VIDEO_FRAME_SCHEMA)


WEBP_ANIM_FRAME_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, "
    "mean_px double, duration_ms int, loop_count int"
)


def webp_anim_frames(df: DataFrame) -> DataFrame:
    """REAL animated-WebP decode (`sources/webp.py`
    ``decode_webp_frames``): composite every ANMF frame onto the canvas
    and emit one row per frame with geometry, the RGB pixel mean, the
    frame duration and the ANIM loop count — the WebP twin of
    :func:`gif_frames`.  Arrow-batched ``mapInPandas``; container bytes
    never leave the executor."""
    from vtk_reserves_spark.sources.webp import decode_webp_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf["doc_id"].astype("int64"), pdf["payload"]):
                frames, durs, loop = decode_webp_frames(bytes(p))
                nf, h, w, _ = frames.shape
                for i in range(nf):
                    rows.append(
                        (did, i, w, h, float(frames[i, :, :, :3].mean()),
                         int(durs[i]), int(loop))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "width", "height",
                         "mean_px", "duration_ms", "loop_count"],
            )

    return df.mapInPandas(run, WEBP_ANIM_FRAME_SCHEMA)


def attach_webp_anim_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a REAL animated-WebP payload per row
    (`sources/webp.py` ``encode_webp_anim``): ``2 + n%3`` solid RGBA
    frames of ``w = 8 + n%6`` by ``h = 8 + n%4`` with
    ``r = (n*11 + f*17) % 256, g = (n*5 + f*29) % 256,
    b = (n*7 + f*13) % 256`` (n = utf-8 byte count), frame durations
    ``10*(f+1)`` ms and loop count ``n % 5``.  VP8L frames are
    lossless and full-canvas no-blend, so the composited decode replays
    the rule exactly and the oracle holds its closed form."""
    from vtk_reserves_spark.sources.webp import encode_webp_anim

    @F.pandas_udf(T.BinaryType())
    def to_anim(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            n = len((t or "").encode("utf-8"))
            nf, w, h = 2 + n % 3, 8 + n % 6, 8 + n % 4
            frames = []
            for f in range(nf):
                img = np.zeros((h, w, 4), np.uint8)
                img[:, :, 0] = (n * 11 + f * 17) % 256
                img[:, :, 1] = (n * 5 + f * 29) % 256
                img[:, :, 2] = (n * 7 + f * 13) % 256
                img[:, :, 3] = 255
                frames.append(img)
            out.append(
                encode_webp_anim(
                    frames,
                    durations_ms=[10 * (f + 1) for f in range(nf)],
                    loop_count=n % 5,
                    # run-LZ77 references collapse the solid frames to a
                    # handful of symbols: decode cost drops ~5x and the
                    # query path still covers backward references +
                    # subtract-green untransform
                    subtract_green=True,
                    use_lz77_runs=True,
                )
            )
        return pd.Series(out)

    with_payload = df.select(F.col(id_col), to_anim(F.col(text_col)).alias("payload"))
    return with_payload.select(
        id_col,
        "payload",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/webp").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_gif_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a REAL animated-GIF payload per row (`sources/gif.py`):
    ``2 + n%3`` flat grayscale frames of ``w = 8 + n%6`` by
    ``h = 8 + n%4``, frame ``f`` uniformly ``(n*13 + f*29) % 256``
    (n = utf-8 byte count).  GIF is LOSSLESS, so unlike the JPEG
    fixtures there is no even-value constraint — any synthesis rule is
    exact, and the oracle replays it in closed form while the payload
    is a genuine LZW-compressed animation."""
    from vtk_reserves_spark.sources.gif import encode_gif

    @F.pandas_udf(T.BinaryType())
    def to_gif(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            n = len((t or "").encode("utf-8"))
            nf, w, h = 2 + n % 3, 8 + n % 6, 8 + n % 4
            frames = np.stack(
                [
                    np.full((h, w), (n * 13 + f * 29) % 256, np.uint8)
                    for f in range(nf)
                ]
            )
            out.append(encode_gif(frames))
        return pd.Series(out)

    with_payload = df.select(F.col(id_col), to_gif(F.col(text_col)).alias("payload"))
    return with_payload.select(
        id_col,
        "payload",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/gif").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_webp_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a REAL lossless-WebP payload per row
    (`sources/webp.py`): a solid ``w = 8 + n%7`` by ``h = 8 + n%5``
    RGBA frame with ``r = n%256, g = (n*3)%256, b = (n*7)%256``
    (n = utf-8 byte count), encoded WITH the subtract-green transform
    and run-LZ77 references — so the query path exercises the VP8L
    transform and backward-reference decode, not just literals.  VP8L
    is lossless, so the oracle replays the rule exactly."""
    from vtk_reserves_spark.sources.webp import encode_webp

    @F.pandas_udf(T.BinaryType())
    def to_webp(texts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for t in texts:
            n = len((t or "").encode("utf-8"))
            w, h = 8 + n % 7, 8 + n % 5
            img = np.zeros((h, w, 4), np.uint8)
            img[:, :, 0] = n % 256
            img[:, :, 1] = (n * 3) % 256
            img[:, :, 2] = (n * 7) % 256
            img[:, :, 3] = 255
            out.append(encode_webp(img, subtract_green=True, use_lz77_runs=True))
        return pd.Series(out)

    with_payload = df.select(F.col(id_col), to_webp(F.col(text_col)).alias("payload"))
    return with_payload.select(
        id_col,
        "payload",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/webp").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def attach_webp_lossy_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a REAL lossy-WebP payload per row (`sources/vp8.py`
    key frames): a ``16*(1 + n%2)`` x 16 frame at quantizer index
    ``n % 128`` whose corner macroblock carries DC-only quantized
    levels (Y2 ``1 + n%7``, U ``1 + 3n%5``, V ``1 + 7n%5``) while the
    remaining MBs skip — DC_PRED propagation makes the decoded frame
    UNIFORM at a closed-form value (integer shifts of level x
    quantizer, then the documented BT.601 conversion), so the oracle
    replays the whole lossy pipeline exactly (n = utf-8 byte count)."""
    from vtk_reserves_spark.sources.vp8 import (
        DC_PRED, H_PRED, TM_PRED, encode_webp_lossy,
    )

    @F.pandas_udf(T.BinaryType())
    def to_lossy(texts: pd.Series) -> pd.Series:
        def flat(y2=0, u=0, v=0, skip=False, ym=DC_PRED, uvm=DC_PRED):
            mb = {"y_mode": ym, "uv_mode": uvm, "skip": skip}
            if not skip:
                mb["y2"] = [y2] + [0] * 15
                mb["u"] = [[u] + [0] * 15 for _ in range(4)]
                mb["v"] = [[v] + [0] * 15 for _ in range(4)]
            return mb

        out = []
        for t in texts:
            n = len((t or "").encode("utf-8"))
            qi = n % 128
            wl, du, dv = 1 + n % 7, 1 + (3 * n) % 5, 1 + (7 * n) % 5
            n_mb = 1 + n % 2
            mbs = [flat(wl, du, dv)]
            if n_mb > 1:
                # non-corner MB: H/TM/DC prediction all propagate the
                # uniform value exactly (left col = v; TM's A and AL are
                # both the 127 border, cancelling) — so the closed-form
                # oracle holds while the mode trees + H/TM predictors
                # get driver-verified coverage
                modes = (DC_PRED, H_PRED, TM_PRED)
                mbs.append(
                    flat(skip=True, ym=modes[n % 3], uvm=modes[(n // 3) % 3])
                )
            out.append(encode_webp_lossy(16 * n_mb, 16, mbs, qi=qi))
        return pd.Series(out)

    with_payload = df.select(F.col(id_col), to_lossy(F.col(text_col)).alias("payload"))
    return with_payload.select(
        id_col,
        "payload",
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/webp").alias("mime"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def sniff_mime(payload: bytes) -> str | None:
    """Magic-byte mime detection — crawl Content-Type headers lie
    routinely (~5-10% of CC image responses are mislabeled), so real
    pipelines sniff the payload and IGNORE the declared type.  Covers
    every format this repo decodes plus the common containers;
    returns None for unrecognized bytes.  Pure function — usable
    inside any Arrow batch or as a pandas_udf."""
    p = bytes(payload[:16]) if payload else b""
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if p[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP":
        return "image/webp"
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return "audio/x-wav"
    if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
        return "video/x-msvideo"
    if p[:2] == b"BM":
        return "image/bmp"
    if p[:4] == b"fLaC":
        return "audio/flac"
    if p[:4] in (b"II*\x00", b"MM\x00*"):
        return "image/tiff"
    if p[:2] in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6") and (
        len(p) < 3 or p[2:3] in (b"\n", b"\r", b" ", b"\t")
    ):
        return "image/x-portable-anymap"
    if p[:4] == b"\x00\x00\x01\x00":
        return "image/x-icon"
    if p[:5] == b"%PDF-":
        return "application/pdf"
    if p[:2] == b"\x1f\x8b":
        return "application/gzip"
    if p[:4] == b"\x28\xb5\x2f\xfd":
        return "application/zstd"
    if p[:4] == b"PK\x03\x04":
        return "application/zip"
    if p[:5] == b"WARC/":
        return "application/warc"
    if p[:9] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1\x00"[:9]:
        return "application/vnd.ms-excel"
    return None


def decode_media(payload: bytes, mime: str, fake: bool = False):
    """Decode one payload.  PNG (pure-zlib), JPEG — baseline AND
    progressive (pure-numpy, ``sources/jpeg.py``) — GIF (pure LZW,
    first frame), BMP and WebP (lossless VP8L AND lossy VP8 key
    frames, ``sources/vp8.py``) decode for real; other mimes need
    codecs absent from this environment, so callers must opt into the
    deterministic fake."""
    if fake:
        n = len(payload)
        return {
            "width": n % 640,
            "height": n % 480,
            "mean_byte": (sum(payload[:64]) / min(n, 64)) if n else 0.0,
        }
    if mime in (None, "", "auto", "application/octet-stream"):
        # crawl Content-Type is unreliable; dispatch on magic bytes
        sniffed = sniff_mime(payload)
        if sniffed is None:
            raise NotImplementedError(
                "payload magic not recognized — cannot sniff a codec "
                "(declared mime was generic/absent)"
            )
        mime = sniffed
    if mime == "image/png":
        from vtk_reserves_spark.sources.image import decode_png

        img = decode_png(bytes(payload))
        return {
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "mean_byte": float(img.mean()),
        }
    if mime in ("image/jpeg", "image/jpg"):
        from vtk_reserves_spark.sources.jpeg import decode_jpeg

        img = decode_jpeg(bytes(payload))
        return {
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "mean_byte": float(img.mean()),
        }
    if mime == "image/webp":
        from vtk_reserves_spark.sources.webp import decode_webp

        img = decode_webp(bytes(payload))
        return {
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "mean_byte": float(img[:, :, :3].mean()),
        }
    if mime in ("image/bmp", "image/x-ms-bmp"):
        from vtk_reserves_spark.sources.bmp import decode_bmp

        img = decode_bmp(bytes(payload))
        return {
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "mean_byte": float(img.mean()),
        }
    if mime == "image/gif":
        from vtk_reserves_spark.sources.gif import decode_gif

        frames, _delays, _loop = decode_gif(bytes(payload))
        return {
            "width": int(frames.shape[2]),
            "height": int(frames.shape[1]),
            "mean_byte": float(frames[0].mean()),
        }
    if mime in (
        "image/x-portable-bitmap", "image/x-portable-graymap",
        "image/x-portable-pixmap", "image/x-portable-anymap",
    ):
        from vtk_reserves_spark.sources.pnm import decode_pnm

        img = decode_pnm(bytes(payload))
        return {
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "mean_byte": float(img.mean()),
        }
    if mime in ("image/tga", "image/x-tga", "image/x-targa"):
        from vtk_reserves_spark.sources.tga import decode_tga

        img = decode_tga(bytes(payload))
        return {
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "mean_byte": float(img[:, :, :3].mean()),
        }
    if mime in ("image/x-icon", "image/vnd.microsoft.icon"):
        from vtk_reserves_spark.sources.ico import decode_ico

        img = decode_ico(bytes(payload))
        return {
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "mean_byte": float(img[:, :, :3].mean()),
        }
    raise NotImplementedError(
        f"no codec for mime {mime!r} in this container (PNG, JPEG, GIF, "
        "BMP, WebP and MJPG-AVI decode for real; WAV/FLAC via "
        "audio_features; other video codecs need ffmpeg) — pass "
        "fake=True for the deterministic "
        "stand-in"
    )


FEATURE_SAFE_SCHEMA = T.StructType(
    list(FEATURE_SCHEMA.fields) + [T.StructField("error", T.StringType())]
)


def extract_features(
    df: DataFrame, fake: bool = True, on_error: str = "raise"
) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta):
    mapInPandas keeps bytes executor-side and processes whole record
    batches per call — the shape real decoders plug into.

    ``on_error``: ``'raise'`` (default — fixtures are known-good, a
    decode error is a bug) or ``'null'`` — REQUIRED posture on real
    crawl data, where a fraction of payloads is always truncated,
    mislabeled or corrupt: failed rows yield NULL features plus an
    ``error`` column (``ExcType: message``) so the pipeline can
    quarantine and count failures instead of losing the task.  One bad
    byte killing a 100 TB job is the failure mode this guards."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    safe = on_error == "null"
    schema = FEATURE_SAFE_SCHEMA if safe else FEATURE_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            errors = []
            for p, m in zip(pdf["payload"], pdf["meta"].map(lambda s: s["mime"])):
                if safe:
                    try:
                        feats.append(decode_media(p, m, fake=fake))
                        errors.append(None)
                    except Exception as exc:  # quarantine, don't die
                        feats.append(
                            {"width": None, "height": None, "mean_byte": None}
                        )
                        errors.append(f"{type(exc).__name__}: {exc}")
                else:
                    feats.append(decode_media(p, m, fake=fake))
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "mean_byte": [f["mean_byte"] for f in feats],
            }
            if safe:
                out["error"] = errors
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def resize_media(
    df: DataFrame, out_w: int, out_h: int, fake: bool = True
) -> DataFrame:
    """Resize plumbing over (doc_id, payload, meta): Arrow-batched
    mapInPandas, bytes stay executor-side, output is the resized
    geometry plus a checkable reduction of the resampled bytes.

    With ``fake=False`` payloads may be PNG or WebP (sniffed on the
    RIFF magic; lossless VP8L or lossy VP8): each image is decoded
    (pure-zlib codec) and resampled nearest-neighbor per axis —
    output pixel ``(r, c)`` reads source pixel
    ``((r·h) // out_h, (c·w) // out_w)`` — and ``mean_byte`` is the
    mean of the resized pixels (``n_bytes`` = resized sample count).

    The ``fake=True`` stand-in (for non-image payloads / oracle
    simplicity) applies the same index math to the raw byte stream:
    sample i reads input byte ``(i·n) // m`` (m = out_w·out_h)."""
    import numpy as np

    m = out_w * out_h

    def one_fake(p) -> tuple[float | None, int]:
        b = np.frombuffer(p, dtype=np.uint8)
        n = b.size
        if n == 0:
            return None, m
        idx = (np.arange(m, dtype=np.int64) * n) // m
        return float(b[idx].mean()), m

    def one_real(p) -> tuple[float | None, int]:
        from vtk_reserves_spark.sources.image import decode_png

        # dispatch on magic: PNG or WebP (lossless VP8L / lossy VP8)
        b = bytes(p)
        if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            from vtk_reserves_spark.sources.webp import decode_webp

            img = decode_webp(b)
        else:
            img = decode_png(b)
        h, w = img.shape[:2]
        rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
        cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
        res = img[rows][:, cols]
        return float(res.mean()), int(res.size)

    one = one_fake if fake else one_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means: list[float | None] = []
            sizes: list[int] = []
            for p in pdf["payload"]:
                mean, nb = one(p)
                means.append(mean)
                sizes.append(nb)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes": sizes,
                    "mean_byte": means,
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


def attach_pdf_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a REAL PDF payload per row (`sources/pdf.py`
    ``write_pdf``): a two-page document — header page ``Doc <id>``
    plus the row's text — titled ``Doc <id>``, written in a per-row
    MIX of layouts (``id % 2`` picks classic xref vs xref-stream +
    object-stream, ``id % 3`` picks raw vs Flate-compressed content
    streams) so every reader path is exercised under the oracle."""

    @F.pandas_udf(T.BinaryType())
    def to_pdf(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        from vtk_reserves_spark.sources.pdf import write_pdf

        out = []
        for did, t in zip(doc_id.astype("int64"), text):
            out.append(
                write_pdf(
                    [f"Doc {did}", t or ""],
                    title=f"Doc {did}",
                    compress=(did % 3 == 0),
                    modern=(did % 2 == 0),
                )
            )
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("doc_id"),
        to_pdf(F.col(id_col), F.col(text_col)).alias("payload"),
    )


PDF_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("npages", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def pdf_text(df: DataFrame, on_error: str = "raise") -> DataFrame:
    """PDF text mining over (doc_id, payload): each payload is parsed
    by the pure-python ISO 32000 reader (sources/pdf.py — both xref
    layouts, object streams, Flate/LZW/ASCII filters, ToUnicode
    CMaps) and reduced to ``(text, npages, title)``.  PDF is the
    second most common document payload in web crawls; this is the
    non-HTML half of crawl-to-corpus text extraction.

    Scale shape mirrors the image codecs: Arrow-batched mapInPandas,
    one payload cell decoded at a time executor-side, bytes never on
    the driver; downstream text ops (quality, dedup, language-id)
    compose on the ``text`` column.  ``on_error='null'`` is the crawl
    posture — corrupt/encrypted PDFs yield NULL text plus an
    ``error`` column for quarantine accounting instead of task
    death."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    safe = on_error == "null"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vtk_reserves_spark.sources.pdf import parse_pdf

        for pdf in batches:
            texts, npages, titles, errors = [], [], [], []
            for p in pdf["payload"]:
                try:
                    parsed = parse_pdf(bytes(p))
                    texts.append("\n\n".join(parsed["pages"]))
                    npages.append(parsed["npages"])
                    titles.append(parsed["title"])
                    errors.append(None)
                except Exception as exc:
                    if not safe:
                        raise
                    texts.append(None)
                    npages.append(None)
                    titles.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "text": texts,
                    "npages": pd.array(npages, dtype="Int32"),
                    "title": titles,
                    "error": errors,
                }
            )

    return df.mapInPandas(run, PDF_TEXT_SCHEMA)


def attach_office_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize a REAL office-document payload per row
    (`sources/office.py` writers): a two-part document — header part
    ``Doc <id>`` plus the row's text — titled ``Doc <id>``.  The
    container KIND rotates per row (``id % 4``: docx / epub / pptx /
    odt) and ``id % 2`` picks stored vs deflated zip members, so
    every reader path is exercised under one oracle."""

    @F.pandas_udf(T.BinaryType())
    def to_office(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        from vtk_reserves_spark.sources import office

        writers = [
            office.write_docx, office.write_epub,
            office.write_pptx, office.write_odt,
        ]
        out = []
        for did, t in zip(doc_id.astype("int64"), text):
            out.append(
                writers[did % 4](
                    [f"Doc {did}", t or ""],
                    title=f"Doc {did}",
                    compress=(did % 2 == 0),
                )
            )
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("doc_id"),
        to_office(F.col(id_col), F.col(text_col)).alias("payload"),
    )


OFFICE_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("nparts", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def office_text(df: DataFrame, on_error: str = "raise") -> DataFrame:
    """Office-document text mining over (doc_id, payload): each
    payload is parsed by the pure-stdlib DOCX/PPTX/ODT/EPUB reader
    (sources/office.py — kind sniffed from the zip member list, so
    extension-less crawl payloads work) and reduced to
    ``(text, nparts, title, kind)`` with parts (paragraphs / slides /
    spine chapters) joined by blank lines.  Zip-packaged office
    documents are the next most common crawl document payloads after
    HTML and PDF; together with ``pdf_text`` this completes the
    crawl-to-corpus document-extraction surface.

    Scale shape mirrors ``pdf_text``: Arrow-batched mapInPandas, one
    payload cell decoded at a time executor-side, bytes never on the
    driver.  ``on_error='null'`` is the crawl posture — corrupt or
    unsupported containers yield NULL text plus an ``error`` column
    for quarantine accounting instead of task death."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    safe = on_error == "null"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vtk_reserves_spark.sources.office import parse_office

        for b in batches:
            texts, nparts, titles, kinds, errors = [], [], [], [], []
            for p in b["payload"]:
                try:
                    parsed = parse_office(bytes(p))
                    texts.append("\n\n".join(parsed["parts"]))
                    nparts.append(len(parsed["parts"]))
                    titles.append(parsed["title"])
                    kinds.append(parsed["kind"])
                    errors.append(None)
                except Exception as exc:
                    if not safe:
                        raise
                    texts.append(None)
                    nparts.append(None)
                    titles.append(None)
                    kinds.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].astype("int64"),
                    "text": texts,
                    "nparts": pd.array(nparts, dtype="Int32"),
                    "title": titles,
                    "kind": kinds,
                    "error": errors,
                }
            )

    return df.mapInPandas(run, OFFICE_TEXT_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 40) -> DataFrame:
    """Frame sampling plumbing: derive a frame count from the payload
    size and explode one row per sampled frame with its byte offset —
    the partition-preserving explode a real video sampler would use.

    Every emitted ``byte_offset`` is strictly inside the payload:
    ``n_frames = ceil(n_bytes / every_n_bytes)`` (the previous
    ``n // every + 1`` emitted a past-the-end frame whenever the size
    was an exact multiple, and one bogus frame for empty payloads —
    empty payloads now emit no rows)."""
    n = F.col("meta.n_bytes")
    n_frames = F.floor((n - 1) / every_n_bytes).cast("int") + 1
    frames = F.when(n > 0, F.sequence(F.lit(0), n_frames - 1))
    return df.select(
        "doc_id",
        F.explode(frames).alias("frame_idx"),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
