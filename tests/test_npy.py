"""NumPy .npy/.npz source: round-trips, dtype/shape policy, the
pickle refusal, compressed bundles."""
import numpy as np
import pytest

from vtk_reserves_spark.sources.npy import (
    npy_bytes,
    npz_bytes,
    read_npy,
    read_npz,
)


def test_npy_2d_roundtrip(spark, tmp_path):
    arr = np.arange(24, dtype=np.float32).reshape(6, 4) / 8
    (tmp_path / "a.npy").write_bytes(npy_bytes(arr))
    rows = sorted(
        read_npy(spark, str(tmp_path / "a.npy")).collect(),
        key=lambda r: r.row_idx,
    )
    assert len(rows) == 6
    assert rows[2].values == [float(x) for x in arr[2]]
    assert rows[0].member == ""


def test_npy_1d_single_row(spark, tmp_path):
    (tmp_path / "v.npy").write_bytes(npy_bytes(np.array([1, 2, 3])))
    rows = read_npy(spark, str(tmp_path / "v.npy")).collect()
    assert len(rows) == 1 and rows[0].values == [1.0, 2.0, 3.0]


def test_npz_members(spark, tmp_path):
    for comp in (False, True):
        blob = npz_bytes(
            compressed=comp,
            vectors=np.ones((3, 2), np.float64),
            ids=np.arange(3).reshape(-1, 1),
        )
        p = tmp_path / f"b{int(comp)}.npz"
        p.write_bytes(blob)
        rows = read_npz(spark, str(p)).collect()
        members = {r.member for r in rows}
        assert members == {"vectors", "ids"}
        assert sum(r.member == "vectors" for r in rows) == 3


def test_rejections(spark, tmp_path):
    # 3-D tensors and object arrays refuse with clear errors
    (tmp_path / "t3.npy").write_bytes(npy_bytes(np.zeros((2, 2, 2))))
    with pytest.raises(Exception, match="1-D or 2-D"):
        read_npy(spark, str(tmp_path / "t3.npy")).collect()
    import io

    buf = io.BytesIO()
    np.save(buf, np.array([{"a": 1}], dtype=object), allow_pickle=True)
    (tmp_path / "obj.npy").write_bytes(buf.getvalue())
    with pytest.raises(Exception):  # numpy itself refuses unpickling
        read_npy(spark, str(tmp_path / "obj.npy")).collect()
