"""WebDataset-style tar shard ingestion."""

from __future__ import annotations

import io
import tarfile

from data_engineering_spark.sources.tar_shards import (
    read_tar_members,
    webdataset_records,
)


def _make_shard(path, samples):
    with tarfile.open(path, "w") as tf:
        for name, payload in samples:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))


def test_read_tar_members_and_group(spark, tmp_path):
    _make_shard(
        tmp_path / "shard-000.tar",
        [
            ("000001.txt", b"hello doc one"),
            ("000001.json", b'{"label": 1}'),
            ("000001.img", b"\x00\x01\x02"),
            ("000002.txt", b"second"),
            ("000002.json", b'{"label": 2}'),
        ],
    )
    _make_shard(
        tmp_path / "shard-001.tar",
        [("000003.txt", b"third"), ("000003.json", b'{"label": 3}')],
    )

    members = read_tar_members(spark, str(tmp_path))
    rows = members.collect()
    assert len(rows) == 7
    by_member = {(r["shard"].split("/")[-1], r["member"]): r for r in rows}
    r = by_member[("shard-000.tar", "000001.txt")]
    assert bytes(r["payload"]) == b"hello doc one" and r["size"] == 13

    recs = webdataset_records(members).collect()
    assert len(recs) == 3
    by_key = {r["key"]: r for r in recs}
    assert by_key["000001"]["n_parts"] == 3
    assert bytes(by_key["000001"]["parts"]["json"]) == b'{"label": 1}'
    assert bytes(by_key["000003"]["parts"]["txt"]) == b"third"


def test_member_glob_prefilter(spark, tmp_path):
    _make_shard(
        tmp_path / "s.tar",
        [("a.txt", b"t"), ("a.bin", b"b"), ("b.txt", b"t2")],
    )
    only_txt = read_tar_members(spark, str(tmp_path), member_glob="*.txt")
    assert sorted(r["member"] for r in only_txt.collect()) == [
        "a.txt", "b.txt",
    ]
