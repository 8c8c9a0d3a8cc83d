"""WebDataset tar-shard source/sink: pack determinism, member fan-out,
first-dot sample grouping, binaryFile shard reading, and the full
write->read round trip with binary payloads."""

from __future__ import annotations

import io
import tarfile

import pytest
from pyspark.sql import functions as F

from vlm_data_pipeline_spark.sources import wds


def _members_df(spark, rows):
    return spark.createDataFrame(
        [(sid, n, bytearray(p)) for sid, n, p in rows],
        "shard_id long, name string, payload binary",
    )


def test_pack_shards_deterministic_and_valid_tar(spark):
    rows = [
        (0, "b.txt", b"beta"),
        (0, "a.txt", b"alpha"),
        (1, "c.bin", bytes(range(256))),
    ]
    out = {
        r.shard_id: r for r in wds.pack_shards(_members_df(spark, rows)).collect()
    }
    assert out[0].n_members == 2 and out[1].n_members == 1
    # byte-determinism: same input -> identical shard bytes
    again = {
        r.shard_id: r for r in wds.pack_shards(_members_df(spark, rows)).collect()
    }
    assert bytes(out[0].tar) == bytes(again[0].tar)
    # the tar is a real USTAR archive, members sorted by name, zero mtime
    with tarfile.open(fileobj=io.BytesIO(bytes(out[0].tar)), mode="r:") as tf:
        names = [m.name for m in tf]
        assert names == ["a.txt", "b.txt"]
        m = tf.getmember("a.txt")
        assert m.mtime == 0 and m.uid == 0 and m.gid == 0


def test_tar_members_and_first_dot_grouping(spark):
    rows = [
        (7, "s1.jpg", b"\xff\xd8fakejpeg"),
        (7, "s1.seg.png", b"\x89PNGfake"),  # multi-dot ext: "seg.png"
        (7, "s1.txt", b"a caption"),
        (7, "s2.txt", b"other"),
    ]
    shards = wds.pack_shards(_members_df(spark, rows))
    members = wds.tar_members(shards)
    got = {(r.shard_id, r.name): r for r in members.collect()}
    assert len(got) == 4
    assert bytes(got[(7, "s1.seg.png")].payload) == b"\x89PNGfake"
    assert got[(7, "s1.txt")].size == len(b"a caption")
    samples = {r.key: r for r in wds.wds_samples(members).collect()}
    assert set(samples) == {"s1", "s2"}
    s1 = samples["s1"].exts
    assert set(s1) == {"jpg", "seg.png", "txt"}
    assert bytes(s1["jpg"]) == b"\xff\xd8fakejpeg"
    assert bytes(samples["s2"].exts["txt"]) == b"other"


def test_dotted_directory_components_group_by_basename(spark):
    """ADVICE r11: a dot in a directory component must NOT truncate the
    sample key — 'v1.2/000123.jpg' keys as 'v1.2/000123' (the WebDataset
    basename rule), not 'v1' (which misgrouped unrelated members into
    one sample and then aborted on duplicate extensions)."""
    rows = [
        (3, "v1.2/000123.jpg", b"img-a"),
        (3, "v1.2/000123.txt", b"cap-a"),
        (3, "v1.2/000456.jpg", b"img-b"),  # old rule: same key 'v1'
        (3, "plain.txt", b"no-dir"),
    ]
    shards = wds.pack_shards(_members_df(spark, rows))
    samples = {
        r.key: r for r in wds.wds_samples(wds.tar_members(shards)).collect()
    }
    assert set(samples) == {"v1.2/000123", "v1.2/000456", "plain"}
    a = samples["v1.2/000123"].exts
    assert set(a) == {"jpg", "txt"} and bytes(a["txt"]) == b"cap-a"
    assert set(samples["v1.2/000456"].exts) == {"jpg"}
    assert bytes(samples["plain"].exts["txt"]) == b"no-dir"


def test_assign_shards_by_bytes_honors_target_under_skew(spark):
    """VERDICT r11 #6: byte-targeted packing must keep every shard near
    target_bytes even when payload sizes are heavily skewed (fixed-count
    sharding packs 20 thumbnails in one shard and 20 videos in the
    next). Bound: a shard never exceeds target + its one straddling
    sample; both members of a sample land in the same shard; the
    assignment is deterministic across runs."""
    rows = []
    for i in range(120):
        # skew: every 10th sample is 100x bigger
        size = 50_000 if i % 10 == 0 else 500
        rows.append((0, f"s{i:04d}.bin", bytes(size)))
        rows.append((0, f"s{i:04d}.txt", b"x" * 10))
    m = _members_df(spark, rows)
    target = 60_000
    out = wds.assign_shards_by_bytes(m, target_bytes=target, n_buckets=4)
    got = out.select("sample", "shard_id", "sample_bytes").collect()
    by_sample = {}
    for r in got:
        by_sample.setdefault(r.sample, set()).add(r.shard_id)
    # each sample maps to exactly one shard (both members co-located)
    assert all(len(s) == 1 for s in by_sample.values())
    # per-shard byte totals: never exceed target + one straddler
    shard_bytes: dict = {}
    max_sample = 0
    seen = set()
    for r in got:
        if r.sample in seen:
            continue
        seen.add(r.sample)
        shard_bytes[r.shard_id] = shard_bytes.get(r.shard_id, 0) + r.sample_bytes
        max_sample = max(max_sample, r.sample_bytes)
    assert max(shard_bytes.values()) <= target + max_sample
    # the skewed corpus spreads across many shards, not a fixed count
    assert len(shard_bytes) >= 4
    # deterministic: identical re-run, identical assignment
    again = {
        (r.sample, r.shard_id)
        for r in wds.assign_shards_by_bytes(
            m, target_bytes=target, n_buckets=4
        ).select("sample", "shard_id").collect()
    }
    assert again == {(r.sample, r.shard_id) for r in got}
    # pack_shards over the assignment produces valid shards
    shards = wds.pack_shards(out)
    total = shards.agg(F.sum("n_members")).collect()[0][0]
    assert total == 240
    import pytest as _pt

    with _pt.raises(ValueError, match="target_bytes"):
        wds.assign_shards_by_bytes(m, target_bytes=0)
    with _pt.raises(ValueError, match="n_buckets"):
        wds.assign_shards_by_bytes(m, target_bytes=10, n_buckets=0)


def test_read_tar_shards_binaryfile(spark, tmp_path):
    p = tmp_path / "shard-000000.tar"
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        info = tarfile.TarInfo("x.txt")
        info.size = 5
        tf.addfile(info, io.BytesIO(b"hello"))
    p.write_bytes(buf.getvalue())
    df = wds.read_tar_shards(spark, str(tmp_path / "*.tar"))
    rows = df.collect()
    assert len(rows) == 1 and rows[0].shard_path.endswith("shard-000000.tar")
    members = wds.tar_members(
        df.select(F_lit_shard(df), "tar"), shard_col="shard_id"
    )
    got = members.collect()
    assert len(got) == 1
    assert got[0].name == "x.txt" and bytes(got[0].payload) == b"hello"


def F_lit_shard(df):
    from pyspark.sql import functions as F

    return F.lit(0).cast("long").alias("shard_id")


def test_non_regular_members_skipped(spark):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        info = tarfile.TarInfo("dir/y.txt")
        info.size = 2
        tf.addfile(info, io.BytesIO(b"ok"))
    df = spark.createDataFrame(
        [(3, bytearray(buf.getvalue()))], "shard_id long, tar binary"
    )
    got = wds.tar_members(df).collect()
    assert [r.name for r in got] == ["dir/y.txt"]


def test_corrupt_tar_raises(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"not a tar at all" * 40))], "shard_id long, tar binary"
    )
    with pytest.raises(Exception):
        wds.tar_members(df).collect()


def test_shard_manifest_prune_roundtrip(spark, tmp_path):
    """Shard-index pushdown (VERDICT r12 stretch): the manifest written
    beside the shards prunes a shard table by sample key WITHOUT
    opening tars — the pruned set is exactly the shards holding wanted
    keys, every wanted sample is recoverable from the pruned tars
    alone, and the parquet round trip keeps the index queryable with a
    pushed-down key predicate."""
    rows = [
        (sid, f"s{sid}_{i}.txt", f"payload {sid} {i}".encode())
        for sid in range(6)
        for i in range(4)
    ]
    members = _members_df(spark, rows)
    manifest = wds.shard_manifest(members)
    # parquet round trip — the on-disk listing contract
    path = str(tmp_path / "manifest.parquet")
    manifest.write.parquet(path)
    man = spark.read.parquet(path)
    assert man.count() == len(rows)
    # the key predicate reaches the parquet reader (a few-MB columnar
    # scan at 100 TB, never a tar open)
    plan = (
        man.filter(F.col("sample") == "s3_1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "sample" in plan.split(
        "PushedFilters"
    )[1][:80]
    shards = wds.pack_shards(members)
    wanted = spark.createDataFrame(
        [("s1_2",), ("s4_0",), ("s4_3",)], "sample string"
    )
    pruned = wds.shards_for_samples(shards, man, wanted)
    got = pruned.collect()
    assert {r.shard_id for r in got} == {1, 4}
    # the wanted samples are all recoverable from the pruned tars alone
    keys = {r.key for r in wds.wds_samples(wds.tar_members(pruned)).collect()}
    assert {"s1_2", "s4_0", "s4_3"} <= keys
    # and nothing outside the pruned shards was touched
    assert all(k.startswith(("s1_", "s4_")) for k in keys)
    # a wanted key absent from the corpus prunes to zero shards
    ghost = spark.createDataFrame([("nope",)], "sample string")
    assert wds.shards_for_samples(shards, man, ghost).count() == 0
