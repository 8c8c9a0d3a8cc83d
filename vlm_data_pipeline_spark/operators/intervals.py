"""Interval algebra at scale: binned overlap joins.

An overlap join (``l.start <= r.end AND r.start <= l.end``) written as
a plain theta join gives Catalyst nothing to hash on — the plan
degenerates to BroadcastNestedLoopJoin (small side) or a cartesian
product (O(|L|·|R|) predicate evaluations; instant death at corpus
scale). The standard scalable re-expression, used by every engine
with a real range-join optimization, is BINNING: quantize the
coordinate axis into fixed-width bins, replicate each interval to
every bin it touches, equi-join on the bin id, then re-check the
exact predicate.

Duplicate elimination is FREE here — no dropDuplicates shuffle: two
overlapping intervals co-occur in every bin their overlap region
touches, but the pair is emitted only from the single bin containing
``max(l.start, r.start)`` (the left edge of the overlap). That bin is
unique per pair, so the output is exact without any post-join
distinct.

Scale shape: one explode per side (replication factor =
interval_length / bin_width + 1 — pick bin_width near the typical
interval length to keep it ~2×), one hash exchange per side on the
bin id, one equi-join. Pathology guard: an interval spanning more
than ``max_bins`` bins (a degenerate bin_width choice — e.g. binning
year-long intervals by the second) raises instead of silently
exploding the replication; AQE's skew-join handles hot bins (many
intervals stabbing one region) the same way it handles any hot key.

These are extensions past reference parity (the reference has no
interval analytics); the nearest-keyframe AS-OF join lives in
sources/hypersim.py (J9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__interval_bin"


def _bins(start: Column, end: Column, width: float) -> Column:
    return F.sequence(
        F.floor(start / F.lit(width)).cast("long"),
        F.floor(end / F.lit(width)).cast("long"),
    )


def _guarded(
    df: DataFrame, start: str, end: str, width: float, max_bins: int, op: str
) -> DataFrame:
    s, e = F.col(start), F.col(end)
    n_bins = F.floor(e / F.lit(width)) - F.floor(s / F.lit(width)) + 1
    ok = (
        s.isNotNull()
        & e.isNotNull()
        & (s <= e)
        & (n_bins <= F.lit(max_bins))
    )
    # assert_true returns NULL when the predicate holds and THROWS
    # otherwise; anchoring it in a filter keeps it un-prunable. Null
    # bounds fail loudly too: a null interval in an overlap join is a
    # bug upstream, not a row to silently drop.
    guard = F.assert_true(
        ok,
        F.concat(
            F.lit(
                f"{op}: null/inverted interval or span over "
                f"{max_bins} bins at bin_width={width} — [{start}, {end}] = ["
            ),
            s.cast("string"),
            F.lit(", "),
            e.cast("string"),
            F.lit("]"),
        ),
    )
    return df.filter(guard.isNull()).withColumn(_BIN, F.explode(_bins(s, e, width)))


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: float,
    max_bins: int = 10_000,
) -> DataFrame:
    """All (left, right) row pairs whose CLOSED intervals
    [left_start, left_end] and [right_start, right_end] overlap, as one
    binned equi-join — exact output, no duplicates, no distinct pass
    (each pair emits only from the bin of max(start, start), see module
    docstring). Column names must be disjoint across the two inputs."""
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")
    if max_bins < 1:
        raise ValueError("max_bins must be >= 1")
    overlap_names = set(left.columns) & set(right.columns)
    if overlap_names:
        raise ValueError(
            f"column names must be disjoint, both sides have: {sorted(overlap_names)}"
        )
    lb = _guarded(left, left_start, left_end, bin_width, max_bins,
                  "interval_overlap_join")
    rb = _guarded(right, right_start, right_end, bin_width, max_bins,
                  "interval_overlap_join")
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    first_bin = F.floor(F.greatest(ls, rs) / F.lit(bin_width)).cast("long")
    return (
        lb.join(rb, _BIN)
        .filter((ls <= re_) & (rs <= le) & (F.col(_BIN) == first_bin))
        .drop(_BIN)
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
    max_bins: int = 10_000,
) -> DataFrame:
    """All (point, interval) pairs with start <= point <= end (closed).
    The point side replicates to exactly ONE bin, so there is no
    duplicate risk at all and the point table — typically the huge side
    — shuffles at 1× its size; only intervals replicate."""
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")
    overlap_names = set(points.columns) & set(intervals.columns)
    if overlap_names:
        raise ValueError(
            f"column names must be disjoint, both sides have: {sorted(overlap_names)}"
        )
    p = F.col(point_col)
    pb = points.filter(p.isNotNull()).withColumn(
        _BIN, F.floor(p / F.lit(bin_width)).cast("long")
    )
    ib = _guarded(intervals, start_col, end_col, bin_width, max_bins,
                  "point_in_interval_join")
    return (
        pb.join(ib, _BIN)
        .filter((F.col(start_col) <= p) & (p <= F.col(end_col)))
        .drop(_BIN)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    allow_exact: bool = True,
    tolerance: float | None = None,
    tie_break_cols: list[str] | None = None,
) -> DataFrame:
    """merge_asof semantics as ONE shuffle: for every left row, the
    single right row (same ``on`` keys) with the largest right_ts <=
    left_ts (``backward``; ``forward`` mirrors). Left rows with no match
    keep NULL right columns — a left join, like pandas.

    Spark has no native as-of join, and the join-then-rank expression
    (sources/hypersim.nearest_keyframe_pose, J9 — correct when the
    right side is per-key tiny) EXPLODES the pre-rank join when both
    sides are large: every left row pairs with every same-key right row
    before row_number culls. The scalable form is the sort-merge union:
    tag both sides, union, ONE window over (keys, ts, side) carrying
    last(right_payload, ignorenulls) — each row is touched once, the
    only exchange is the window's hash partition on the keys, and state
    per partition is one payload struct. This is the classic
    distributed ASOF re-expression (the same shape engines with native
    ASOF JOIN lower to).

    Ties: right rows sharing the match timestamp resolve to the LARGEST
    tuple over ``tie_break_cols`` (default: every right payload column,
    compared as a struct in order) — deterministic, pinned in tests.
    Pass an explicit subset when the right side carries non-ORDERABLE
    column types (maps etc. cannot appear in a window ordering), or to
    pick the semantic tie-break key (e.g. an event id).
    ``allow_exact=False`` excludes right_ts == left_ts. ``tolerance``
    (seconds for timestamp columns, native units for numerics) nulls
    out matches farther than the bound — the match is still the
    nearest one, as pandas defines it.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    dup = (set(left.columns) & set(right.columns)) - set(keys)
    if dup:
        raise ValueError(
            f"non-key column names must be disjoint, both sides have: {sorted(dup)}"
        )
    r_payload = [c for c in right.columns if c not in keys]
    l_struct = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in left.schema.fields]
    )
    r_struct = T.StructType(
        [
            T.StructField(f.name, f.dataType, True)
            for f in right.schema.fields
            if f.name in r_payload
        ]
    )
    # side ordering at EQUAL ts decides exact-match semantics: the
    # window scans in (ts, side) order, so a right row sorted before
    # the left row is visible to it
    r_side = 0 if allow_exact else 2
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(r_struct).alias("__r"),
    )
    # a NULL right_ts would sort FIRST under asc ordering and become
    # every left row's fallback match — drop it (pandas merge_asof
    # rejects NaT keys for the same reason); null LEFT ts rows need no
    # handling: they sort before every right row and match nothing
    r2 = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.lit(None).cast(l_struct).alias("__l"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
    )
    if tie_break_cols is not None:
        bad = set(tie_break_cols) - set(r_payload)
        if bad:
            raise ValueError(
                f"tie_break_cols not in the right payload: {sorted(bad)}"
            )
        tie = F.struct(*[F.col("__r")[c] for c in tie_break_cols])
    else:
        tie = F.col("__r")
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__side").asc(), tie.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    if tolerance is not None:
        if tolerance < 0:
            raise ValueError("tolerance must be >= 0")
        delta = F.col("__ts").cast("double") - matched[right_ts].cast("double")
        if direction == "forward":
            delta = -delta
        matched = F.when(delta <= F.lit(float(tolerance)), matched)
    out = (
        l2.unionByName(r2)
        .withColumn("__m", matched)
        .filter(F.col("__side") == 1)
    )
    # a null LEFT ts can never match (under desc/forward ordering such
    # rows sort last and would otherwise see every right row)
    m = F.when(F.col("__ts").isNotNull(), F.col("__m"))
    return out.select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        *[m[c].alias(c) for c in r_payload],
    )
