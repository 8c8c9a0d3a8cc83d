"""Frame-level audio analysis as in-row column programs.

The decode boundary stays where every multimodal stage put it
(``sources.multimodal.audio_features``: Arrow-batched mapInPandas over
WAV bytes, samples never leave the stage) — but FEATURES over an
already-materialized integer-PCM column (``array<int>``, e.g. int16
sample values) belong JVM-side: framing is ``slice``, energy is an
``aggregate`` fold, zero-crossings are an index-pair filter. Zero
shuffle, whole-stage codegen, and — because the math is all integers —
bit-exact across engines, so the DuckDB oracle re-derives every cell
(``d_pcm_frames``), unlike float DSP which could only be
tolerance-checked.

This is the VAD/silence-trim stage of a speech-corpus pipeline (think
LibriVox/Common Voice preprocessing): frame energy gates silence,
zero-crossing rate separates voiced/unvoiced, the trim bounds crop the
payload. At 100 TB the shape is exactly right: samples arrive
partitioned by file from the scan, features collapse each row's
samples array to a bounded frames array in place, and only the
(tiny) per-frame feature rows ever shuffle.

Reference scope: the reference pipeline is vision-only (SURVEY §2.1);
this extends the brief's multimodal surface the same way wav_codec did.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "n_frames",
    "pcm_frame_features",
    "silence_bounds",
    "d_pcm_frames",
    "d_silence_bounds",
]


def n_frames(samples: Column, frame: int, hop: int) -> Column:
    """floor((n - frame)/hop) + 1 full frames (0 when n < frame) —
    trailing partial frames are dropped, the librosa convention."""
    n = F.size(samples)
    full = (F.floor((n - frame) / hop) + 1).cast("int")
    return F.when(n >= frame, full).otherwise(F.lit(0))


def pcm_frame_features(samples: Column, frame: int = 16, hop: int = 16) -> Column:
    """``array<struct<frame_idx,int energy,long zcr,long peak,long>>``
    over integer PCM: energy = Σx² (exact: int16² sums stay inside
    BIGINT for any realistic frame), zcr = adjacent sign-boundary flips
    (x >= 0 vs x < 0), peak = max |x|. One in-row program; no shuffle."""
    if frame < 2 or hop < 1:
        raise ValueError("frame must be >= 2 and hop >= 1")

    def one(i: Column) -> Column:
        fr = F.slice(samples, i * hop + 1, frame)
        energy = F.aggregate(
            fr, F.lit(0).cast("long"), lambda a, x: a + (x * x).cast("long")
        )
        zcr = F.size(
            F.filter(
                F.sequence(F.lit(1), F.lit(frame - 1)),
                lambda j: (F.element_at(fr, j) >= 0)
                != (F.element_at(fr, j + 1) >= 0),
            )
        ).cast("long")
        peak = F.array_max(F.transform(fr, F.abs)).cast("long")
        return F.struct(
            i.cast("int").alias("frame_idx"),
            energy.alias("energy"),
            zcr.alias("zcr"),
            peak.alias("peak"),
        )

    k = n_frames(samples, frame, hop)
    return F.when(k > 0, F.transform(F.sequence(F.lit(0), k - 1), one)).otherwise(
        F.array().cast(
            "array<struct<frame_idx:int,energy:long,zcr:long,peak:long>>"
        )
    )


def silence_bounds(frames: Column, threshold: int) -> Column:
    """``struct<first_loud:int, last_loud:int, n_loud:long>`` over a
    :func:`pcm_frame_features` array — the trim decision (frames with
    energy > threshold bound the kept span; all-NULL when the whole
    clip is silence)."""
    loud = F.filter(frames, lambda f: f["energy"] > threshold)
    first = F.element_at(loud, 1)["frame_idx"]
    last = F.element_at(loud, -1)["frame_idx"]
    n = F.size(loud).cast("long")
    empty = F.size(loud) == 0
    return F.struct(
        F.when(~empty, first).alias("first_loud"),
        F.when(~empty, last).alias("last_loud"),
        n.alias("n_loud"),
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors (generated from the same parameters)
# ---------------------------------------------------------------------------


def d_pcm_frames(expr: str, frame: int = 16, hop: int = 16) -> str:
    """DuckDB mirror of :func:`pcm_frame_features` as a list of
    STRUCTs; ``expr`` is a BIGINT/INT list expression. list_sum is
    CAST to BIGINT (DuckDB widens sums to HUGEINT, which the driver's
    value hash rejects)."""
    fr = f"({expr})[(i*{hop}+1):(i*{hop}+{frame})]"
    return (
        f"CASE WHEN len({expr}) >= {frame} THEN "
        f"list_transform(range(0, ((len({expr}) - {frame}) // {hop}) + 1),"
        f" i -> {{'frame_idx': CAST(i AS INT),"
        f" 'energy': CAST(list_sum(list_transform({fr},"
        f" x -> CAST(x AS BIGINT) * x)) AS BIGINT),"
        f" 'zcr': CAST(len(list_filter(range(1, {frame}),"
        f" j -> ({fr}[j] >= 0) <> ({fr}[j+1] >= 0))) AS BIGINT),"
        f" 'peak': CAST(list_max(list_transform({fr}, x -> abs(x)))"
        f" AS BIGINT)}}) "
        f"ELSE [] END"
    )


def d_silence_bounds(frames_expr: str, threshold: int) -> str:
    """DuckDB mirror of :func:`silence_bounds` (NULL bounds on
    all-silent input)."""
    loud = f"list_filter({frames_expr}, f -> f.energy > {threshold})"
    return (
        f"{{'first_loud': CAST({loud}[1].frame_idx AS INT),"
        f" 'last_loud': CAST({loud}[-1].frame_idx AS INT),"
        f" 'n_loud': CAST(len({loud}) AS BIGINT)}}"
    )
