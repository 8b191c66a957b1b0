"""Multimodal columns — image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched mapInPandas (north-star
extension, BASELINE.json:6).

The container ships no image/audio codecs, so the DECODE step is a
clearly-marked deterministic fake (`_fake_decode`) behind the same
interface a real libjpeg/ffmpeg-backed decoder would implement; the
Spark-side plumbing — binary column handling, Arrow batch iteration,
output schema, partition-parallel execution — is real and tested.
Swap `decode_fn` for a real decoder and nothing else changes.

Scale shape: decode/feature-extract is map-only over Arrow batches; no
shuffle is introduced; binary payloads never leave their input split
until explicitly aggregated.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, format string, "
    "n_frames int"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image/video decoder.  A real
    implementation would raise NotImplementedError without codecs; the
    fake derives plausible metadata purely from the byte stream so tests
    and oracles stay deterministic."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 64 + 1,
        "height": (n // 64) % 64 + 1,
        "format": "fakeimg" if n % 2 == 0 else "fakevid",
        "n_frames": 1 if n % 2 == 0 else n % 30 + 1,
    }


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text
    standing in for image bytes) — the fixture has no true binary
    column, but the pipeline downstream treats it as opaque."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_metadata(
    df: DataFrame,
    decode_fn: Optional[Callable[[bytes], dict]] = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas decode: binary -> typed metadata rows."""
    decode = decode_fn or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(bytes(b)) for b in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, DECODE_SCHEMA)


def frame_sample(
    decoded: DataFrame,
    every_nth: int = 10,
) -> DataFrame:
    """Frame sampling for 'video' rows: 1 metadata row -> ceil(n/ k)
    frame rows, as a JVM-side generator (no UDF needed once metadata is
    typed)."""
    idx = F.sequence(
        F.lit(0), F.greatest(F.lit(0), (F.col("n_frames") - 1) / every_nth).cast("int")
    )
    return decoded.filter(F.col("format") == "fakevid").select(
        "doc_id",
        "n_frames",
        F.explode(F.transform(idx, lambda i: i * every_nth)).alias("frame_idx"),
    )


FEATURE_BINS = 16


def extract_features(
    df: DataFrame,
    n_bins: int = FEATURE_BINS,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Feature extraction over opaque binary payloads: a normalized
    byte-histogram embedding (n_bins buckets of 256/n_bins byte values),
    as an Arrow-batched pandas UDF — the multimodal analog of the text
    embedder, and the exact batch shape a real CLIP/wav2vec feature
    extractor would use (payload batch in -> fixed-dim vector batch
    out).  Deterministic: features depend only on the bytes.  Map-only;
    payloads never shuffle."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    width = 256 // n_bins

    # micro-unit integer output (count * 1e6 // size — PURE integer
    # arithmetic): the repo-wide determinism discipline.  The earlier
    # floor(float_div * 1e6) form could disagree with an engine's
    # integer division by one unit whenever the float quotient rounds
    # UP across an integer boundary; exact int arithmetic cannot.
    @pandas_udf("array<bigint>")
    def feats(payloads: pd.Series) -> pd.Series:
        out = []
        for b in payloads:
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            if arr.size == 0:
                out.append([0] * n_bins)
                continue
            hist = np.bincount(arr // width, minlength=n_bins).astype("int64")
            micro = hist * 1_000_000 // arr.size
            out.append([int(x) for x in micro])
        return pd.Series(out)

    return df.select(id_col, feats(F.col(payload_col)).alias("features"))


def resize_stub(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """'Resize' for opaque payloads: nearest-neighbor byte resampling to
    out_w*out_h bytes via mapInPandas — a deterministic stand-in for a
    real image resize (no codecs in the container; a libvips/PIL-backed
    fn slots into the same signature).  Output schema carries the new
    payload plus its dimensions, mirroring how a real pipeline feeds
    resized tensors downstream.  Map-only, Arrow-batched."""
    import numpy as np

    target = out_w * out_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, sizes = [], []
            for b in pdf[payload_col]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size == 0:
                    res = np.zeros(target, dtype=np.uint8)
                else:
                    idx = (np.arange(target) * arr.size // target).clip(
                        0, arr.size - 1
                    )
                    res = arr[idx]
                payloads.append(res.tobytes())
                sizes.append(int(arr.size))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes_in": sizes,
                    "out_w": out_w,
                    "out_h": out_h,
                    "resized": payloads,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, "doc_id long, n_bytes_in long, out_w int, out_h int, resized binary"
    )
