"""The two reference upload extensions the reference accepts but never
parses (`workbook_exporter-fe.py:1928` ALLOWED_EXTENSIONS): .docx reads
via the stdlib zip+XML WordprocessingML reader, .eyaml/.yaml reads a
previous export back into flat rows. Writer-based strategy like the
.xls tests: each test constructs the container itself."""

from __future__ import annotations

from collections import OrderedDict


PARAS = [
    "First paragraph of the quarterly export notes.",
    "Tab\there and a\nline break survive as control chars.",
    "Ümlauts & <angle brackets> round-trip too.",
]


def test_docx_roundtrip(tmp_path):
    from workbook_exporter_fe_ray.sources.docx import read_docx_table, write_docx

    p = str(tmp_path / "notes.docx")
    write_docx(p, PARAS)
    tbl = read_docx_table(p)
    assert tbl.column_names == ["para_id", "text"]
    assert tbl["text"].to_pylist() == PARAS
    assert tbl["para_id"].to_pylist() == [0, 1, 2]


def test_docx_rejects_non_docx_zip(tmp_path):
    import zipfile

    import pytest

    from workbook_exporter_fe_ray.sources.docx import read_docx_table

    p = str(tmp_path / "bogus.docx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("unrelated.txt", "nope")
    with pytest.raises(ValueError, match="word/document.xml"):
        read_docx_table(p)


def test_read_auto_dispatches_docx(tmp_path, ray_session):
    from workbook_exporter_fe_ray.sources import read_auto
    from workbook_exporter_fe_ray.sources.docx import write_docx

    p = str(tmp_path / "upload.docx")
    write_docx(p, PARAS)
    df = read_auto(p).to_pandas()
    assert list(df.columns) == ["para_id", "text"]
    assert df["text"].tolist() == PARAS
    # empty paragraphs are dropped, ids stay dense document order
    assert df["para_id"].tolist() == [0, 1, 2]


def test_read_auto_reads_back_yaml_export(tmp_path, ray_session):
    from workbook_exporter_fe_ray.sinks.yaml_sink import render_yaml
    from workbook_exporter_fe_ray.sources import read_auto

    doc = OrderedDict(
        [
            (
                "node_exporter",
                OrderedDict(
                    [
                        ("hosta.example.com", OrderedDict(port=9100, done="yes")),
                        ("hostb.example.com", OrderedDict(port=9100, done=None)),
                    ]
                ),
            ),
            ("blackbox", OrderedDict([("hostc", OrderedDict(module="http_2xx"))])),
        ]
    )
    p = tmp_path / "prior_export.eyaml"
    p.write_text(render_yaml(doc), encoding="utf-8")
    df = read_auto(str(p)).to_pandas()
    assert list(df.columns) == ["section", "host", "field", "value"]
    assert len(df) == 5
    row = df[(df.host == "hosta.example.com") & (df.field == "port")]
    assert row["value"].tolist() == ["9100"]
    # None renders to empty string, not "None"
    assert (
        df[(df.host == "hostb.example.com") & (df.field == "done")]["value"].item()
        == ""
    )
    assert set(df["section"]) == {"node_exporter", "blackbox"}


def test_hive_fixture_deterministic_and_resumable(tmp_path, ray_session):
    import shutil

    import pyarrow.parquet as pq

    from workbook_exporter_fe_ray.sources.formats import synth_hive_events

    a = str(tmp_path / "hive_a")
    b = str(tmp_path / "hive_b")
    synth_hive_events(a, n_sources=4)
    # partial generation: drop one partition + the sentinel, re-ensure
    synth_hive_events(b, n_sources=4)
    shutil.rmtree(b + "/source=src02")
    import os

    os.remove(b + "/_DONE")
    synth_hive_events(b, n_sources=4)
    for s in range(4):
        ta = pq.read_table(f"{a}/source=src{s:02d}/part.parquet")
        tb = pq.read_table(f"{b}/source=src{s:02d}/part.parquet")
        assert ta.equals(tb)  # rng stream stays aligned across resume


def test_hive_partition_read_recovers_key(tmp_path, ray_session):
    import ray.data

    from workbook_exporter_fe_ray.sources.formats import synth_hive_events

    root = str(tmp_path / "hive")
    synth_hive_events(root, n_sources=3)
    df = ray.data.read_parquet(root).to_pandas()
    assert set(df.columns) == {"event_id", "cents", "source"}
    assert set(df["source"]) == {"src00", "src01", "src02"}
    # per-partition event_id ranges don't overlap (the lineage property)
    g = df.groupby("source")["event_id"]
    assert (g.min() // 100_000 == g.max() // 100_000).all()
