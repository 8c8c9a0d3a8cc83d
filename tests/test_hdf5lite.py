"""HDF5 decode path (sources/hdf5lite.py): a test-side writer emits real
HDF5 v0 bytes (superblock, symbol-table group, v1 object headers,
contiguous and gzip-chunked layouts) and the library — and the DEFAULT
hypersim parser, with no h5py and no injected fake — reads them back."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from vlm_data_pipeline_spark.sources import hypersim
from vlm_data_pipeline_spark.sources.hdf5lite import list_datasets, read_datasets

UNDEF = 0xFFFFFFFFFFFFFFFF


def _u(v, n):
    return int(v).to_bytes(n, "little")


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return _u(mtype, 2) + _u(len(body), 2) + b"\x00" * 4 + body


def _object_header(messages: list[bytes]) -> bytes:
    blob = b"".join(messages)
    n = len(messages)
    return b"\x01\x00" + _u(n, 2) + _u(1, 4) + _u(len(blob), 4) + b"\x00" * 4 + blob


def _dataspace(shape) -> bytes:
    return (
        b"\x01" + _u(len(shape), 1) + b"\x00" + b"\x00" * 5
        + b"".join(_u(s, 8) for s in shape)
    )


def _dtype_f8() -> bytes:
    return (
        bytes([0x11, 0x20, 0x3F, 0x00])  # v1 float, LE, all-bits flags
        + _u(8, 4)
        + _u(0, 2) + _u(64, 2)           # bit offset / precision
        + bytes([52, 11, 0, 52])         # exp loc/size, mant loc/size
        + _u(1023, 4)                    # exponent bias
    )


def _dtype_i8() -> bytes:
    return bytes([0x10, 0x08, 0x00, 0x00]) + _u(8, 4) + _u(0, 2) + _u(64, 2)


class Writer:
    """Sequential HDF5-v0 writer with address fixups."""

    def __init__(self):
        self.buf = bytearray()
        self.fixups = []  # (pos, fn() -> int)

    def tell(self):
        return len(self.buf)

    def emit(self, b: bytes) -> int:
        pos = len(self.buf)
        self.buf.extend(b)
        return pos

    def placeholder8(self) -> int:
        pos = len(self.buf)
        self.buf.extend(b"\x00" * 8)
        return pos

    def patch(self, pos: int, value: int):
        self.buf[pos : pos + 8] = _u(value, 8)

    def finish(self) -> bytes:
        return bytes(self.buf)


def make_hdf5(datasets: dict[str, np.ndarray], chunk_gzip: set[str] = frozenset()) -> bytes:
    """Emit a real HDF5 file: v0 superblock, cached root symbol table,
    local heap, group B-tree + SNOD, one v1 object header per dataset."""
    w = Writer()
    names = sorted(datasets)

    # ---- superblock (96 bytes), addresses patched at the end
    w.emit(b"\x89HDF\r\n\x1a\n")
    w.emit(bytes([0, 0, 0, 0, 0, 8, 8, 0]))
    w.emit(_u(4, 2) + _u(16, 2) + _u(0, 4))
    w.emit(_u(0, 8) + _u(UNDEF, 8))
    eof_pos = w.placeholder8()
    w.emit(_u(UNDEF, 8))
    # root symbol-table entry (cache_type 1: scratch carries btree+heap)
    w.emit(_u(0, 8))
    root_ohdr_pos = w.placeholder8()
    w.emit(_u(1, 4) + _u(0, 4))
    btree_pos = w.placeholder8()
    heap_pos = w.placeholder8()

    # ---- root object header (symbol table message)
    root_ohdr = w.tell()
    st_body_btree = None
    body = _u(0, 8) + _u(0, 8)
    hdr = _object_header([_msg(0x0011, body)])
    root_ohdr_off = w.emit(hdr)
    # the symbol-table message body sits 16 bytes into the header blob
    st_body_btree = root_ohdr_off + 16 + 8
    w.patch(root_ohdr_pos, root_ohdr)

    # ---- local heap: empty name at 0, then each dataset name 8-aligned
    heap_data = bytearray(b"\x00" * 8)
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        heap_data.extend(n.encode() + b"\x00")
        heap_data.extend(b"\x00" * (-len(heap_data) % 8))
    heap_addr = w.tell()
    heap_data_addr_pos = None
    hp = b"HEAP" + bytes([0, 0, 0, 0]) + _u(len(heap_data), 8) + _u(UNDEF, 8)
    w.emit(hp)
    heap_data_addr_pos = w.placeholder8()
    w.patch(heap_data_addr_pos, w.tell())
    w.emit(bytes(heap_data))
    w.patch(heap_pos, heap_addr)
    w.patch(st_body_btree + 8, heap_addr)

    # ---- group B-tree (level 0, one SNOD child)
    btree_addr = w.tell()
    w.emit(b"TREE" + bytes([0, 0]) + _u(1, 2) + _u(UNDEF, 8) + _u(UNDEF, 8))
    w.emit(_u(0, 8))  # key0: empty string
    snod_pos = w.placeholder8()
    w.emit(_u(name_off[names[-1]], 8))  # key1: last name
    w.patch(btree_pos, btree_addr)
    w.patch(st_body_btree, btree_addr)

    # ---- SNOD with one entry per dataset (sorted)
    snod_addr = w.tell()
    w.emit(b"SNOD" + bytes([1, 0]) + _u(len(names), 2))
    ohdr_pos = {}
    for n in names:
        w.emit(_u(name_off[n], 8))
        ohdr_pos[n] = w.placeholder8()
        w.emit(_u(0, 4) + _u(0, 4) + b"\x00" * 16)
    w.patch(snod_pos, snod_addr)

    # ---- datasets
    for n in names:
        arr = np.ascontiguousarray(datasets[n])
        dt = _dtype_f8() if arr.dtype == np.float64 else _dtype_i8()
        if n in chunk_gzip:
            rank = arr.ndim
            chunk_dims = list(arr.shape)  # single chunk
            raw = zlib.compress(arr.tobytes())
            layout_body = (
                b"\x03\x02"
                + _u(rank + 1, 1)
                + b"\x00" * 8  # btree addr patched below
                + b"".join(_u(d, 4) for d in chunk_dims)
                + _u(arr.dtype.itemsize, 4)
            )
            filt_body = (
                b"\x01\x01" + b"\x00" * 6
                + _u(1, 2) + _u(0, 2) + _u(1, 2) + _u(1, 2) + _u(6, 4) + _u(0, 4)
            )
            hdr = _object_header(
                [
                    _msg(0x0001, _dataspace(arr.shape)),
                    _msg(0x0003, dt),
                    _msg(0x000B, filt_body),
                    _msg(0x0008, layout_body),
                ]
            )
            haddr = w.emit(hdr)
            w.patch(ohdr_pos[n], haddr)
            # find the layout body inside the emitted header to patch btree
            li = bytes(w.buf).index(layout_body, haddr)
            # chunk B-tree: one entry
            bt = w.tell()
            w.buf[li + 3 : li + 11] = _u(bt, 8)
            key = lambda size, offs: _u(size, 4) + _u(0, 4) + b"".join(  # noqa: E731
                _u(o, 8) for o in offs
            )
            w.emit(b"TREE" + bytes([1, 0]) + _u(1, 2) + _u(UNDEF, 8) + _u(UNDEF, 8))
            w.emit(key(len(raw), [0] * rank + [0]))
            data_pos = w.placeholder8()
            w.emit(key(0, list(arr.shape) + [arr.dtype.itemsize]))
            w.patch(data_pos, w.tell())
            w.emit(raw)
        else:
            layout_body = b"\x03\x01" + b"\x00" * 8 + _u(arr.nbytes, 8)
            hdr = _object_header(
                [
                    _msg(0x0001, _dataspace(arr.shape)),
                    _msg(0x0003, dt),
                    _msg(0x0008, layout_body),
                ]
            )
            haddr = w.emit(hdr)
            w.patch(ohdr_pos[n], haddr)
            li = bytes(w.buf).index(layout_body, haddr)
            w.buf[li + 2 : li + 10] = _u(w.tell(), 8)
            w.emit(arr.tobytes())

    w.patch(eof_pos, w.tell())
    return w.finish()


FIXTURE = {
    "dataset": np.arange(12, dtype=np.float64).reshape(4, 3) * 0.5,
    "frame_indices": np.array([0, 10, 20, 35], dtype=np.int64),
    "orient": np.arange(18, dtype=np.float64).reshape(2, 3, 3),
}


def test_list_and_read_contiguous():
    blob = make_hdf5(FIXTURE)
    assert list_datasets(blob) == sorted(FIXTURE)
    out = read_datasets(blob, ["dataset", "frame_indices", "orient", "missing"])
    assert set(out) == {"dataset", "frame_indices", "orient"}
    np.testing.assert_array_equal(out["dataset"], FIXTURE["dataset"])
    np.testing.assert_array_equal(out["frame_indices"], FIXTURE["frame_indices"])
    np.testing.assert_array_equal(out["orient"], FIXTURE["orient"])
    assert out["frame_indices"].dtype == np.int64


def test_read_gzip_chunked():
    blob = make_hdf5(FIXTURE, chunk_gzip={"dataset"})
    out = read_datasets(blob, ["dataset"])
    np.testing.assert_array_equal(out["dataset"], FIXTURE["dataset"])


def test_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        read_datasets(b"\x00" * 64, ["dataset"])


def test_default_hypersim_parser_end_to_end(spark, tmp_path):
    """The DEFAULT S5 parser decodes real HDF5 bytes through the full
    binaryFile/mapInPandas stage — no h5py, no injected fake (the
    reference's camera_keyframe_* file shapes, hypersim_processor.py:55-89)."""
    pos = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    idx = np.array([0, 15], dtype=np.int64)
    (tmp_path / "camera_keyframe_positions.hdf5").write_bytes(
        make_hdf5({"dataset": pos})
    )
    (tmp_path / "camera_keyframe_frame_indices.hdf5").write_bytes(
        make_hdf5({"dataset": idx}, chunk_gzip={"dataset"})
    )

    df = hypersim.read_hdf5_datasets(spark, str(tmp_path), ["dataset"])
    rows = {r.path.split("/")[-1]: r for r in df.collect()}
    p = rows["camera_keyframe_positions.hdf5"]
    assert p.shape == [2, 3] and p.values == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    i = rows["camera_keyframe_frame_indices.hdf5"]
    assert i.shape == [2] and i.values == [0.0, 15.0]


def test_superblock_v2_raises_actionable_error():
    """A v2/v3 superblock (newer HDF5 libraries) must fail fast with a
    message naming the h5py injection seam, not a cryptic offset error."""
    sig = b"\x89HDF\r\n\x1a\n"
    v2 = sig + bytes([2]) + b"\x00" * 120  # version byte 2, padded header
    with pytest.raises(ValueError, match="superblock version 0.*h5py"):
        read_datasets(v2, ["depth"])
